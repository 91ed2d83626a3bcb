package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.sources.GraftTable

/** Structured-Streaming analytics over the ingest stream — the brief's
  * "watermarks + windowed aggs; mapGroupsWithState for custom state"
  * coverage. The reference is not a streaming SQL engine (SURVEY §2.10: its
  * "streaming" is the durable ingest pipeline), so these are Spark-first
  * additions: the same `time_bucket`/session-window semantics the batch
  * queries q13/q14/q41 pin, run incrementally over an unbounded source.
  */
object StreamingAnalytics {

  /** Exact µs → Timestamp (state arithmetic runs on microseconds because
    * `Timestamp.getTime` is ms-truncating — the q76 oracle caught the
    * rounded session boundaries). Shared by every custom-state operator
    * here; a precision fix must not be able to diverge them. */
  private def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Watermarked per-bucket counts — the streaming q13/q14 shape.
    * `withWatermark` bounds state: buckets older than the watermark are
    * finalized and evicted, so state size is O(keys × buckets-in-flight)
    * regardless of stream length. */
  def bucketCounts(source: DataFrame, timeCol: String, bucket: String,
      watermark: String, keys: Seq[String]): DataFrame =
    source
      .withWatermark(timeCol, watermark)
      .groupBy(keys.map(col) :+ window(col(timeCol), bucket).as("__w"): _*)
      .agg(count(lit(1)).as("n"))
      .select(keys.map(col) ++ Seq(
        col("__w.start").cast("timestamp_ntz").as("bucket_start"),
        col("n")): _*)

  /** Continuous aggregate (the TimescaleDB continuous-aggregate shape the
    * reference's `time_bucket` users downsample with): maintain the
    * bucketed counts of [[bucketCounts]] in a [[GraftTable]] whose dedup
    * keys are (bucket_start, key). Update-mode emission re-sends a bucket's
    * row whenever late-but-inside-watermark data changes it; each emission
    * is appended as a NEW VERSION, and the merge-on-read keep-greatest view
    * resolves to the latest count — late data corrects buckets in place,
    * with full version history until compaction.
    *
    * The table's dedup tiebreak is stamped per micro-batch from the
    * checkpoint (same replay-idempotence contract as
    * [[StreamingIngest.start]]). */
  def continuousAggregate(source: DataFrame, table: GraftTable,
      timeCol: String, bucket: String, watermark: String, key: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      stamp: Option[Long => java.time.LocalDateTime] = None): StreamingQuery =
    bucketCounts(source, timeCol, bucket, watermark, Seq(key))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = stamp.map(_(batchId))
          .getOrElse(StreamingIngest.persistedStamp(table, checkpoint, batchId))
        table.append(
          batch.select(
            col(key).as("project_id"),
            col("bucket_start").as("timestamp"),
            col(key).as("id"),
            col("n")),
          Some(st))
      }
      .start()

  /** Exact per-bucket percentiles as a watermarked streaming aggregation
    * — the percentile face of the continuous aggregate (reference users'
    * `percentile_agg` over `time_bucket` windows). `collect_list` is a
    * streaming-legal imperative aggregate, so the whole operator stays
    * DECLARATIVE: state per (key, bucket) is the bucket's value multiset,
    * and every update-mode emission recomputes the interpolated
    * percentiles (PostgreSQL `percentile_cont` semantics:
    * `lo + (hi − lo) · frac` at rank `(n−1)·p`) — order-independent, so
    * the streamed result is bit-equal to the batch answer and the DuckDB
    * oracle can gate it.
    *
    * State honesty: an EXACT percentile needs the full multiset, so state
    * is O(rows in bucket) — the right default for dashboard-width buckets
    * (an hour of one tenant). For unbounded-cardinality buckets swap in
    * [[digestPercentiles]]'s fixed-size sketch — the reference's
    * percentile_agg makes exactly that trade. */
  def bucketPercentiles(source: DataFrame, timeCol: String, bucket: String,
      watermark: String, key: String, valueCol: String,
      ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    def interp(vs: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column, p: Double): org.apache.spark.sql.Column = {
      val h = (n - 1) * lit(p)
      val lo = floor(h).cast("int")
      val frac = h - floor(h)
      val vLo = element_at(vs, lo + 1)
      val vHi = element_at(vs, least(lo + 2, n).cast("int"))
      round(vLo + (vHi - vLo) * frac, 6)
    }
    source
      .withWatermark(timeCol, watermark)
      .groupBy(col(key), window(col(timeCol), bucket).as("__w"))
      .agg(collect_list(col(valueCol)).as("__vs"))
      .select(
        Seq(col(key),
          col("__w.start").cast("timestamp_ntz").as("bucket_start"),
          size(col("__vs")).cast("long").as("n")) ++
        ps.map(p => interp(sort_array(col("__vs")), size(col("__vs")), p)
          .as(s"p${(p * 100).round}")): _*)
  }

  /** The bounded-state variant: one t-digest sketch per (key, bucket)
    * ([[graft.functions.PercentileAggSketch]] is a
    * `TypedImperativeAggregate`, hence streaming-legal) — fixed state per
    * bucket regardless of row count, quantile error per the digest's
    * compression. Emissions carry the serialized sketch; read quantiles
    * with `PercentileAgg.approx_percentile`. Digest merge order varies
    * with partitioning,
    * so results are approximate AND run-order-dependent — spec-gated by
    * error bound, not oracle hash (the exact operator above is the
    * oracle-gated face). */
  def digestPercentiles(source: DataFrame, timeCol: String, bucket: String,
      watermark: String, key: String, valueCol: String): DataFrame =
    source
      .withWatermark(timeCol, watermark)
      .groupBy(col(key), window(col(timeCol), bucket).as("__w"))
      .agg(graft.functions.PercentileAgg.percentile_agg(col(valueCol))
        .as("digest"))
      .select(col(key),
        col("__w.start").cast("timestamp_ntz").as("bucket_start"),
        col("digest"))

  /** Maintain [[bucketPercentiles]] in a merge-on-read table (same
    * convergence contract as [[continuousAggregate]]: update-mode
    * re-emissions version-append, keep-greatest resolves to the latest
    * correction). */
  def continuousPercentiles(source: DataFrame, table: GraftTable,
      timeCol: String, bucket: String, watermark: String, key: String,
      valueCol: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      stamp: Option[Long => java.time.LocalDateTime] = None): StreamingQuery =
    bucketPercentiles(source, timeCol, bucket, watermark, key, valueCol)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = stamp.map(_(batchId))
          .getOrElse(StreamingIngest.persistedStamp(table, checkpoint, batchId))
        table.append(
          batch.select(
            col(key).as("project_id"),
            col("bucket_start").as("timestamp"),
            col(key).as("id"),
            col("p50"), col("p95"), col("n")),
          Some(st))
      }
      .start()

  /** Watermarked stream-stream event-time interval join — the funnel /
    * attribution shape ("purchase within N minutes of a view by the same
    * user") that needs BOTH sides buffered in state. Inner join on
    * `keyCols` plus the range condition
    * `left.ts <= right.ts < left.ts + windowExpr`; each side carries its
    * own watermark, and the range bound is what lets Spark age out state
    * (left rows older than `rightWatermark − window` can never match
    * again). Inner-join emission is match-driven, not watermark-driven, so
    * with a sufficient watermark delay the emitted set equals the batch
    * join exactly — which is how the oracle pins it.
    *
    * Column hygiene: both inputs are projected to disambiguated names
    * BEFORE the join (stream-stream self-joins otherwise collide on every
    * attribute). Returns the joined frame with `l_`/`r_` prefixed columns.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, timeCol: String,
      keyCols: Seq[String], windowExpr: String, watermark: String): DataFrame = {
    def side(df: DataFrame, p: String) = {
      val renamed = df.columns.foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, p + c))
      renamed.withWatermark(p + timeCol, watermark)
    }
    val l = side(left, "l_")
    val r = side(right, "r_")
    val key = keyCols.map(k => col("l_" + k) === col("r_" + k))
      .reduce(_ && _)
    l.join(r, key &&
      col("r_" + timeCol) >= col("l_" + timeCol) &&
      col("r_" + timeCol) < col("l_" + timeCol) + expr(s"INTERVAL $windowExpr"))
  }

  /** Watermarked streaming exact dedup — the ingest-time twin of the
    * batch exact dedup (q24): keep the FIRST arrival of each id, drop
    * every later duplicate (retries, replays, at-least-once sources).
    * `dropDuplicatesWithinWatermark` is the scale path: id state older
    * than the watermark is evicted, so state is bounded by the
    * duplicate-arrival horizon × id rate instead of growing with the
    * stream — the documented contract being that duplicates arrive close
    * together in event time, which is what retry/replay duplication does.
    */
  def dedupStream(source: DataFrame, timeCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    source.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  // --- streaming as-of enrichment -----------------------------------------

  /** Input row for [[asOfStream]]: `side` 0 = right (state/build), 1 =
    * left (probe); `us` is the event time in exact microseconds
    * ([[sessionize]]'s ms-truncation lesson); `id` identifies left rows
    * (-1 on right rows); `value` is the right payload (None on left). */
  case class AsOfIn(key: String, side: Int, ts: Timestamp, us: Long,
      id: Long, value: Option[Double])
  /** Buffered per-key state: pending left rows (us, id) not yet final,
    * and the right rows still able to match a future left. */
  case class AsOfBuf(lefts: List[(Long, Long)],
      rights: List[(Long, Option[Double])])
  /** One enriched left row: the latest right at-or-before its time. */
  case class AsOfHit(key: String, id: Long, ts: Timestamp,
      matched_ts: Option[Timestamp], value: Option[Double])

  /** Streaming as-of enrichment — [[graft.operators.AsOfJoin]] run
    * incrementally with custom state: each left row is emitted exactly
    * once, enriched with the latest right row at or before its event
    * time, once the watermark guarantees no earlier right row can still
    * arrive (a left row is final at `ts <= watermark`, because any
    * not-yet-arrived right row must carry `ts > watermark`).
    *
    * State per key is bounded by the watermark delay: pending lefts drain
    * as the watermark passes them, and of the right rows at or before the
    * watermark only the LATEST is retained (it is the only one a future
    * left can still match — anything older is dominated). Emission on
    * both paths: new batches for active keys, event-time timeout for keys
    * whose pending lefts outlive their event flow. */
  def asOfStream(events: DataFrame, watermark: String): Dataset[AsOfHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(key: String, evs: Iterator[AsOfIn],
        state: GroupState[AsOfBuf]): Iterator[AsOfHit] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
      val (inL, inR) = evs.toList.partition(_.side == 1)
      val lefts = st.lefts ++ inL.map(e => (e.us, e.id))
      // a right row's payload may legitimately be NULL — it is still the
      // match for lefts at-or-after it (same atomic-carry rule as the
      // batch operator: a null value must not fall through to an older row)
      val rights = (st.rights ++ inR.map(e => (e.us, e.value)))
        .sortBy(_._1)
      // compute emissions BEFORE pruning — the dominated right rows may
      // still be the match for a left row being finalized in this call
      val (emit, pending) = lefts.partition(_._1 <= wmUs)
      val hits = emit.sortBy(_._1).map { case (lus, id) =>
        rights.takeWhile(_._1 <= lus).lastOption match {
          case Some((rus, v)) =>
            AsOfHit(key, id, usToTs(lus), Some(usToTs(rus)), v)
          case None => AsOfHit(key, id, usToTs(lus), None, None)
        }
      }
      val (oldR, liveR) = rights.partition(_._1 <= wmUs)
      val keepR = oldR.lastOption.toList ++ liveR
      if (pending.isEmpty && keepR.isEmpty) state.remove()
      else {
        state.update(AsOfBuf(pending, keepR))
        // pending lefts finalize purely by watermark advance — wake the
        // key on the next advance even if no further events arrive
        if (pending.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      hits.iterator
    }
    events
      .select(col("key").cast("string").as("key"),
        col("side").cast("int").as("side"),
        col("ts").cast("timestamp").as("ts"),
        col("id").cast("long").as("id"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[AsOfIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  // --- streaming conversion funnel ----------------------------------------

  /** Input row for [[funnelStream]]: `step` is the 0-based index of the
    * event's funnel step (events of other types are filtered before). */
  case class FunnelIn(key: String, ts: Timestamp, us: Long, step: Int)
  /** Buffered per-key step events (us, stepIdx) awaiting finalization. */
  case class FunnelBuf(events: List[(Long, Int)])
  /** One finalized funnel: the key's anchored step times (null-padded via
    * Options past the break point). Supports up to the steps declared. */
  case class FunnelHit(key: String, steps: Seq[Option[Timestamp]])

  /** Streaming conversion funnel — [[graft.operators.Funnel]] run
    * incrementally: first-touch anchored at the key's earliest step-0
    * event, greedy-earliest later steps within `windowUs` of the anchor.
    * A key's funnel FINALIZES when the watermark reaches anchor + window:
    * at that point the anchor is fixed (no earlier step-0 event can still
    * arrive — it would be late) and every in-window event has arrived, so
    * the emitted row equals the batch operator's.
    *
    * State is bounded by the watermark delay plus the funnel window:
    * before an anchor exists, buffered events at or before the watermark
    * are dropped (no future step-0 event can precede them); once an
    * anchor exists, events past the anchor's deadline are dropped (the
    * deadline can only move EARLIER if a still-earlier anchor arrives,
    * so nothing pruned can become relevant). */
  def funnelStream(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowExpr: String,
      watermark: String): Dataset[FunnelHit] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(windowExpr)) match {
      case iv =>
        require(iv.months == 0, "funnel window must be day/time-based")
        iv.days * 86400000000L + iv.microseconds
    }
    val nSteps = steps.size
    def fn(key: String, evs: Iterator[FunnelIn],
        state: GroupState[FunnelBuf]): Iterator[FunnelHit] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val buf = state.getOption.map(_.events).getOrElse(Nil) ++
        evs.map(e => (e.us, e.step))
      val anchors = buf.filter(_._2 == 0).map(_._1)
      val anchor = if (anchors.isEmpty) None else Some(anchors.min)
      anchor match {
        case Some(a) if wmUs >= a + windowUs =>
          // finalized: replay the batch operator's greedy chain on the
          // complete in-window event set
          val sorted = buf.sortBy(identity)
          val times = new Array[Option[Long]](nSteps)
          times(0) = Some(a)
          var prev = a
          var i = 1
          var broken = false
          while (i < nSteps) {
            if (broken) times(i) = None
            else sorted.collectFirst {
              case (us, s) if s == i && us > prev && us <= a + windowUs => us
            } match {
              case Some(us) => times(i) = Some(us); prev = us
              case None => times(i) = None; broken = true
            }
            i += 1
          }
          state.remove()
          Iterator.single(FunnelHit(key, times.toSeq.map(_.map(usToTs))))
        case other =>
          val keep = other match {
            case Some(a) => buf.filter(_._1 <= a + windowUs)
            case None => buf.filter(_._1 > wmUs)
          }
          if (keep.isEmpty) state.remove()
          else {
            state.update(FunnelBuf(keep))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          Iterator.empty
      }
    }
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc) }
    events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"), stepIdx.as("step"))
      .filter(col("step") >= 0)
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[FunnelIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** One closed session: [start, end] plus its event count. */
  case class Session(key: String, session_start: Timestamp,
      session_end: Timestamp, n: Long)

  // encoder targets; public because Spark's generated (de)serializer code
  // lives outside this object and cannot touch private classes.
  // `us` carries the event time as exact MICROSECONDS: Timestamp.getTime
  // is millisecond-truncating, and state arithmetic on it silently rounds
  // every session boundary to the ms (caught by the q76 oracle compare).
  case class Ev(key: String, ts: Timestamp, us: Long)
  case class OpenSession(start: Long, end: Long, n: Long) // bounds in µs

  /** Event-time session windows via `flatMapGroupsWithState` — the
    * streaming counterpart of q41 (batch `session_window`), and the brief's
    * "custom state" requirement exercised for real: state per key is the
    * set of OPEN sessions (merged under the gap rule as batches arrive;
    * out-of-order arrivals inside the watermark merge/bridge sessions
    * exactly like the batch operator), and a session is emitted only once
    * its quiet period has passed the watermark — either on a later batch
    * for the same key or on the event-time timeout for idle keys. State is
    * O(open sessions per key); closed sessions leave state immediately. */
  def sessionize(source: DataFrame, keyCol: String, timeCol: String,
      gapMillis: Long, watermark: String): Dataset[Session] = {
    val spark = source.sparkSession
    import spark.implicits._

    val gapUs = gapMillis * 1000L
    def fn(key: String, evs: Iterator[Ev],
        state: GroupState[List[OpenSession]]): Iterator[Session] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val merged = {
        val incoming = evs.map(e => OpenSession(e.us, e.us, 1L))
        val all = (state.getOption.getOrElse(Nil) ++ incoming)
          .sortBy(s => (s.start, s.end))
        // fold sessions whose gap-extended ranges overlap; STRICT < matches
        // Spark's session_window (an event at exactly end+gap opens a new
        // session), which keeps q41 and this operator interchangeable
        all.foldLeft(List.empty[OpenSession]) {
          case (head :: tail, s) if s.start < head.end + gapUs =>
            OpenSession(head.start, math.max(head.end, s.end),
              head.n + s.n) :: tail
          case (acc, s) => s :: acc
        }.reverse
      }
      // close once the watermark REACHES end+gap: no event before wm can
      // arrive anymore, and an event at exactly end+gap would not merge —
      // also guarantees every remaining open session satisfies
      // end+gap > wm, which setTimeoutTimestamp requires
      val (closed, open) = merged.partition(_.end + gapUs <= wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(open)
        // wake this key when its oldest open session's quiet period can
        // next close (watermark-driven event-time timeout); +1 ms so the
        // µs→ms floor can never round the timer down to ≤ the current
        // watermark (which setTimeoutTimestamp rejects) — firing 1 ms
        // late is harmless, closability is re-checked against wm anyway
        state.setTimeoutTimestamp(
          Math.floorDiv(open.map(_.end).min + gapUs, 1000L) + 1L)
      }
      closed.iterator.map(s =>
        Session(key, usToTs(s.start), usToTs(s.end), s.n))
    }

    source
      // project/cast BEFORE the watermark: a cast after withWatermark mints
      // a fresh attribute without the watermark tag, and event-time timeout
      // then rejects the plan
      .select(col(keyCol).cast("string").as("key"),
        col(timeCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      // derived AFTER the watermark so `ts` keeps its event-time tag
      .withColumn("us", unix_micros(col("ts")))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  // --- streaming heavy hitters --------------------------------------------

  /** Continuous frequent-items over a token stream — the trending-terms
    * shape: a GLOBAL Misra–Gries aggregate ([[graft.functions.MisraGries]])
    * in update mode. Each micro-batch folds its tokens into the
    * checkpointed sketch state and re-emits the one refreshed row
    * `(sk: map<token,count>, n: running total)`, which `foreachBatch`
    * appends to `outPath` tagged with its batch id — the row with the
    * highest batch id IS the current sketch.
    *
    * State is ONE aggregation buffer of ≤ capacity counters regardless of
    * stream length (the whole point of the sketch), so this runs forever
    * at fleet ingest rates; candidates inherit the MG superset guarantee
    * for any share > 1/(capacity+1), and an exact verify over the
    * accumulated corpus (same second pass as
    * [[graft.operators.TextAnalysis.heavyHitters]]) makes the final
    * answer exact. */
  def heavyHitterStream(source: DataFrame, tokenCol: String, capacity: Int,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.select(col(tokenCol).as("token"))
      .agg(graft.functions.MisraGries.misra_gries(col("token"), capacity)
          .as("sk"),
        count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
      }
      .start()

  // --- streaming EWMA -------------------------------------------------------

  /** Input row for [[ewmaStream]]. */
  case class EwmaIn(key: String, ts: Timestamp, us: Long, id: Long,
      value: Double)
  /** Per-key state: the fold so far (`acc` over `n` finalized points) plus
    * the (us, id, value) points not yet final — rows later than the
    * watermark could still be preceded by an unseen earlier row, so they
    * wait. Pending size is bounded by the watermark delay, the fold itself
    * is O(1) — the streaming-native state shape for a recursion. */
  case class EwmaBuf(acc: Option[Double], n: Long,
      pending: List[(Long, Long, Double)])
  /** One per-key snapshot after a drain: the fold over the first `n`
    * points. The row with the highest `n` per key is the current level. */
  case class EwmaSnap(key: String, n: Long, ewma: Double)

  /** Input row for [[cusumStream]]. */
  case class HoltIn(key: String, ts: Timestamp, us: Long, value: Double)
  case class HoltBuf(l: Double, b: Double, hours: Long,
      pending: List[(Long, Double)])
  case class HoltSnap(key: String, n_hours: Long, l: Double, b: Double)

  /** [[sequenceStream]] input/state/output: `last2` carries the final
    * events preceding the next drain's first trigram (cross-drain
    * adjacency); `pending` buffers events the watermark has not
    * finalized. An event is FINAL once `us < wm` — any later arrival has
    * `us ≥ wm` and sorts strictly after every final event, so adjacency
    * among final events can never be broken retroactively. */
  case class SeqIn(key: String, ts: Timestamp, us: Long, id: Long,
      etype: String)
  case class SeqBuf(last2: List[(Long, Long, String)],
      pending: List[(Long, Long, String)])
  case class SeqRow(key: String, path: String)

  /** Streaming event-sequence mining — the per-user trigram extraction of
    * batch q132 maintained in-stream. Each drain sorts its newly-final
    * events by (event time, id), chains them after the previous drain's
    * last two final events, and emits one row per trigram whose third
    * element just finalized; the reading query aggregates paths exactly
    * like batch, so the union of all drains reproduces the batch lead()
    * window row-for-row under the same oracle. State per key: two events
    * + the watermark-bounded pending buffer. */
  def sequenceStream(events: DataFrame,
      watermark: String): Dataset[SeqRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(key: String, evs: Iterator[SeqIn],
        state: GroupState[SeqBuf]): Iterator[SeqRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(SeqBuf(Nil, Nil))
      val pending = st.pending ++ evs.map(e => (e.us, e.id, e.etype))
      // STRICT <: a row with event time == watermark can still be
      // admitted in a later drain and must be able to extend the chain
      val (ready, rest) = pending.partition(_._1 < wmUs)
      val readySorted = ready.sortBy(p => (p._1, p._2))
      val chain = st.last2 ++ readySorted
      // every sliding triple ends in a NEWLY-final event — last2 holds at
      // most two elements, so index ≥ 2 of the chain is always in ready —
      // which makes each emission new by construction (triples finalized
      // by earlier drains ended before last2's tail)
      val out = chain.sliding(3).filter(_.size == 3)
        .map(t => SeqRow(key, s"${t(0)._3} > ${t(1)._3} > ${t(2)._3}"))
        .toList
      val last2 = chain.takeRight(2)
      if (rest.isEmpty && last2.isEmpty) state.remove()
      else {
        state.update(SeqBuf(last2, rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      out.iterator
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("id").cast("long").as("id"),
        col("etype").cast("string").as("etype"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[SeqIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** [[apdexStream]] state: per open day, the (n, satisfied, tolerating)
    * counts; a day emits once, when the watermark closes it. */
  case class ApdexBuf(pending: Map[Long, (Long, Long, Long)])
  case class ApdexRow(key: String, day_us: Long, n: Long, n_sat: Long,
      n_tol: Long)

  /** [[histQuantileStream]] state: per open day, the cumulative
    * histogram's (le, count) cells as a flat list; a day's quantile is
    * computed once, when the watermark closes it. */
  case class HistQBuf(pending: List[(Long, Double, Long)])
  case class HistQRow(key: String, day_us: Long, n: Long, p95_raw: Double,
      is_inf: Boolean)

  /** [[holtWintersStream]] state: the Holt level/trend fold plus the
    * 24-slot hour-of-day seasonal vector and the slot of the last folded
    * hour (`s_next` in the snapshot reads slot+1). Pending is bounded by
    * the watermark delay; the fold is O(1) + the 24-double vector. */
  case class HwBuf(l: Double, b: Double, seas: Array[Double], hours: Long,
      lastSlot: Int, pending: List[(Long, Double)])
  case class HwSnap(key: String, n_hours: Long, l: Double, b: Double,
      s_next: Double)

  case class BurnIn(key: String, ts: Timestamp, us: Long, isErr: Boolean)
  /** `last5`: the 5 most recent CLOSED hourly rows (hour_us, n, n_err) —
    * the trailing window of the SRE fast+slow guard is ROW-based over
    * non-empty hours, exactly the batch `rowsBetween(-5, 0)`; `pending`:
    * hour_us → (n, n_err) for hours the watermark has not closed. */
  case class BurnBuf(last5: List[(Long, Long, Long)],
      pending: Map[Long, (Long, Long)])
  case class BurnRow(key: String, hour_us: Long, n: Long, n_err: Long,
      burn_1h: Double, burn_6h: Double)

  case class GapfillIn(key: String, ts: Timestamp, us: Long, value: Double)
  /** `lastObs`: the newest CLOSED observed bucket (left endpoint of any
    * future gap) — kept for the key's lifetime; `pending`:
    * bucket_us → (decimal cents, count) for buckets the watermark has
    * not closed yet. */
  case class GapfillBuf(lastObs: Option[(Long, Double)],
      pending: Map[Long, (Long, Long)])
  case class GapfillRow(key: String, bucket_us: Long, filled: Boolean,
      value_interp: Double)

  case class CusumIn(key: String, ts: Timestamp, us: Long, value: Double)
  /** Per-key state: the CUSUM fold so far over `hours` COMPLETE hours
    * plus the raw (us, value) points of hours the watermark has not yet
    * closed. Pending is bounded by the watermark delay × arrival rate;
    * the fold itself is O(1). */
  case class CusumBuf(s: Double, mx: Double, al: Long, hours: Long,
      pending: List[(Long, Double)])
  /** Snapshot after a drain: the fold over the first `n_hours` complete
    * hours. Highest `n_hours` per key = the current alert state. */
  case class CusumSnap(key: String, n_hours: Long, s: Double, mx: Double,
      alarms: Long)

  /** Streaming CUSUM drift alerting — the q118 recursion maintained
    * in-stream against a FIXED target (the deployed-alert shape: μ comes
    * from the SLO/baseline, not from the series' own mean, which a
    * stream cannot know upfront). An hour folds exactly once, when the
    * watermark passes its end — every event of that hour has then
    * arrived (later arrivals would be late) — and its mean replays the
    * batch dsum semantics digit for digit: each value rounds to
    * DECIMAL(18,2) via `BigDecimal.valueOf` (the same shortest-repr
    * conversion Spark's double→decimal cast uses), sums exactly, casts
    * to double, divides by the count. Hours fold in ascending order
    * across watermark-monotone drains, so the final snapshot per key is
    * bit-equal to the batch fold and sits under the same recursive-CTE
    * oracle with the literal target. */
  def cusumStream(events: DataFrame, target: Double, k: Double, h: Double,
      watermark: String): Dataset[CusumSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def fn(key: String, evs: Iterator[CusumIn],
        state: GroupState[CusumBuf]): Iterator[CusumSnap] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(CusumBuf(0.0, 0.0, 0L, 0L, Nil))
      val pending = st.pending ++ evs.map(e => (e.us, e.value))
      val (ready, rest) = pending.partition { case (us, _) =>
        us - us % hourUs + hourUs <= wmUs
      }
      var s = st.s; var mx = st.mx; var al = st.al; var hours = st.hours
      ready.groupBy { case (us, _) => us - us % hourUs }
        .toSeq.sortBy(_._1).foreach { case (_, pts) =>
          val sum = pts.foldLeft(java.math.BigDecimal.ZERO) { (a, p) =>
            a.add(java.math.BigDecimal.valueOf(p._2)
              .setScale(2, java.math.RoundingMode.HALF_UP))
          }
          val xm = sum.doubleValue() / pts.size
          // ONE combined threshold subtraction — the oracle writes
          // `s + xm − (target+k)` as a single literal, and
          // ((a − target) − k) is not bit-equal to (a − (target+k))
          val sNew = math.max(0.0, s + xm - (target + k))
          mx = math.max(mx, sNew)
          if (sNew > h) al += 1L
          s = sNew
          hours += 1L
        }
      if (rest.isEmpty && hours == 0L) state.remove()
      else {
        state.update(CusumBuf(s, mx, al, hours, rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      if (ready.nonEmpty) Iterator.single(CusumSnap(key, hours, s, mx, al))
      else Iterator.empty
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[CusumIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming Holt linear smoothing — the batch q119 level+trend
    * recursion maintained in-stream (the forecasting half of
    * seasonal-baseline alerting, deployed per series): hourly means
    * buffer until the watermark closes the hour, then fold through the
    * identical double expressions as the batch `aggregate` HOF
    * (l₁ = x₁, b₁ = 0; lₜ = α·x + (1−α)·(l+b), bₜ = β·(lₜ−l) + (1−β)·b),
    * hourly means replaying batch dsum DECIMAL semantics digit for digit
    * — the final snapshot per key is bit-equal to the batch fold under
    * the same recursive-CTE oracle. State: (l, b, n) + the open hours. */
  def holtStream(events: DataFrame, alpha: Double, beta: Double,
      watermark: String): Dataset[HoltSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def fn(key: String, evs: Iterator[HoltIn],
        state: GroupState[HoltBuf]): Iterator[HoltSnap] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(HoltBuf(0.0, 0.0, 0L, Nil))
      val pending = st.pending ++ evs.map(e => (e.us, e.value))
      val (ready, rest) = pending.partition { case (us, _) =>
        us - us % hourUs + hourUs <= wmUs
      }
      var l = st.l; var b = st.b; var hours = st.hours
      ready.groupBy { case (us, _) => us - us % hourUs }
        .toSeq.sortBy(_._1).foreach { case (_, pts) =>
          val sum = pts.foldLeft(java.math.BigDecimal.ZERO) { (a, p) =>
            a.add(java.math.BigDecimal.valueOf(p._2)
              .setScale(2, java.math.RoundingMode.HALF_UP))
          }
          val xm = sum.doubleValue() / pts.size
          if (hours == 0L) { l = xm; b = 0.0 }
          else {
            val lNew = alpha * xm + (1.0 - alpha) * (l + b)
            b = beta * (lNew - l) + (1.0 - beta) * b
            l = lNew
          }
          hours += 1L
        }
      if (rest.isEmpty && hours == 0L) state.remove()
      else {
        state.update(HoltBuf(l, b, hours, rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      if (ready.nonEmpty) Iterator.single(HoltSnap(key, hours, l, b))
      else Iterator.empty
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[HoltIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming Apdex — the batch q124 SLA-satisfaction index maintained
    * incrementally: per series, daily (total, satisfied ≤ t,
    * tolerating ≤ 4t) counts buffer until the watermark closes the day,
    * then emit. Counts are integers and the index division happens in the
    * reading query with the identical double expression as batch, so the
    * appended union of all drains is row-for-row the batch output under
    * the same oracle. State per key: the open days' three counters —
    * bounded by the watermark delay. */
  def apdexStream(events: DataFrame, t: Double,
      watermark: String): Dataset[ApdexRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    def fn(key: String, evs: Iterator[HoltIn],
        state: GroupState[ApdexBuf]): Iterator[ApdexRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(ApdexBuf(Map.empty))
      var pending = st.pending
      evs.foreach { e =>
        val d = e.us - java.lang.Math.floorMod(e.us, dayUs)
        val (n0, s0, t0) = pending.getOrElse(d, (0L, 0L, 0L))
        pending = pending.updated(d, (n0 + 1L,
          s0 + (if (e.value <= t) 1L else 0L),
          t0 + (if (e.value > t && e.value <= 4 * t) 1L else 0L)))
      }
      val (closed, open) = pending.partition(_._1 + dayUs <= wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(ApdexBuf(open))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      closed.toSeq.sortBy(_._1).iterator.map { case (d, (n, s, tl)) =>
        ApdexRow(key, d, n, s, tl)
      }
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[HoltIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming Prometheus-style histogram_quantile — the batch q106
    * operator maintained incrementally: per series, daily bucket counters
    * (le = the 10-wide bucket upper bound, +Inf for the overflow) buffer
    * until the watermark closes the day; the closing day walks its
    * cumulative histogram with the IDENTICAL double arithmetic as the
    * batch window pipeline (winner bucket = least le with cum ≥ q·total;
    * linear interpolation inside it; the +Inf winner reports the highest
    * finite bound) and emits the raw quantile — the reading query applies
    * the same final rounding as batch, so drains are row-for-row the
    * batch output under the same oracle. State per key: the open days'
    * bucket cells (≤ buckets per day), watermark-bounded. */
  def histQuantileStream(events: DataFrame, q: Double,
      watermark: String): Dataset[HistQRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    def fn(key: String, evs: Iterator[HoltIn],
        state: GroupState[HistQBuf]): Iterator[HistQRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(HistQBuf(Nil))
      var cells = st.pending.map { case (d, le, c) => ((d, le), c) }.toMap
      evs.foreach { e =>
        val d = e.us - java.lang.Math.floorMod(e.us, dayUs)
        val le = if (e.value >= 90.0) Double.PositiveInfinity
          else (math.floor(e.value / 10.0) + 1) * 10.0
        cells = cells.updated((d, le), cells.getOrElse((d, le), 0L) + 1L)
      }
      val (closed, open) = cells.partition(_._1._1 + dayUs <= wmUs)
      if (open.isEmpty) state.remove()
      else {
        state.update(HistQBuf(open.toList.map { case ((d, le), c) =>
          (d, le, c)
        }))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      closed.groupBy(_._1._1).toSeq.sortBy(_._1).iterator.map {
        case (d, dayCells) =>
          val buckets = dayCells.toSeq
            .map { case ((_, le), c) => (le, c) }.sortBy(_._1)
          val total = buckets.map(_._2).sum
          // NaN marks "no finite bucket at all" — batch's max(when(...))
          // is NULL there; the reading query maps the NaN back to null
          val maxFinite = buckets.map(_._1).filter(!_.isInfinity)
            .reduceOption((a, b) => math.max(a, b)).getOrElse(Double.NaN)
          var cum = 0L; var prevLe = 0.0
          var p95 = 0.0; var isInf = false; var found = false
          buckets.foreach { case (le, c) =>
            val cumNew = cum + c
            if (!found && cumNew >= q * total) {
              found = true
              if (le.isInfinity) { p95 = maxFinite; isInf = true }
              else p95 = prevLe + (le - prevLe) *
                (q * total - cum) / (cumNew - cum)
            }
            prevLe = le; cum = cumNew
          }
          HistQRow(key, d, total, p95, isInf)
      }
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[HoltIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming Holt-Winters — the batch q129 triple-smoothing recursion
    * (level + trend + 24-slot hour-of-day seasonality) maintained
    * in-stream. An hour folds exactly once, when the watermark passes its
    * end; its mean replays the batch dsum semantics (2-dp decimal
    * summation, order-independent) and the level/trend/seasonal updates
    * are the identical double expressions with binary-exact α/β/γ
    * (0.5/0.25/0.125), so the max-n_hours snapshot per key is bit-equal
    * to the batch fold under the same recursive-CTE oracle. State: the
    * O(1) fold + the 24-double seasonal vector + the watermark-bounded
    * pending buffer — independent of stream length. */
  def holtWintersStream(events: DataFrame, alpha: Double, beta: Double,
      gamma: Double, watermark: String): Dataset[HwSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def fn(key: String, evs: Iterator[HoltIn],
        state: GroupState[HwBuf]): Iterator[HwSnap] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(
        HwBuf(0.0, 0.0, Array.fill(24)(0.0), 0L, 0, Nil))
      val pending = st.pending ++ evs.map(e => (e.us, e.value))
      val (ready, rest) = pending.partition { case (us, _) =>
        us - us % hourUs + hourUs <= wmUs
      }
      var l = st.l; var b = st.b; var hours = st.hours
      var seas = st.seas; var lastSlot = st.lastSlot
      ready.groupBy { case (us, _) => us - us % hourUs }
        .toSeq.sortBy(_._1).foreach { case (hourStart, pts) =>
          val sum = pts.foldLeft(java.math.BigDecimal.ZERO) { (a, p) =>
            a.add(java.math.BigDecimal.valueOf(p._2)
              .setScale(2, java.math.RoundingMode.HALF_UP))
          }
          val xm = sum.doubleValue() / pts.size
          // hour-of-day in the naive (session-UTC) frame — the batch
          // query's `hour(date_trunc('hour', ts))`
          val slot = ((hourStart / hourUs) % 24L).toInt
          val sPrev = seas(slot)
          val lNew =
            if (hours == 0L) xm
            else alpha * (xm - sPrev) + (1.0 - alpha) * (l + b)
          val bNew =
            if (hours == 0L) 0.0
            else beta * (lNew - l) + (1.0 - beta) * b
          seas = seas.updated(slot, gamma * (xm - lNew) + (1.0 - gamma) * sPrev)
          l = lNew; b = bNew; lastSlot = slot
          hours += 1L
        }
      if (rest.isEmpty && hours == 0L) state.remove()
      else {
        state.update(HwBuf(l, b, seas, hours, lastSlot, rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      if (ready.nonEmpty)
        Iterator.single(HwSnap(key, hours, l, b, seas((lastSlot + 1) % 24)))
      else Iterator.empty
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[HoltIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming multi-window SLO burn rate — the batch q114 operator (the
    * SRE-workbook fast+slow alert guard) maintained incrementally, i.e.
    * the shape an alert evaluator actually DEPLOYS: per series, hourly
    * (total, error) counts buffer until the watermark closes the hour;
    * a closing hour joins a deque of the 5 previous closed non-empty
    * hours (the trailing window is ROW-based, exactly the batch
    * `rowsBetween(-5, 0)`) and emits its 1 h and 6 h error-budget burn.
    * Counts are integers until the final divisions — the identical
    * double expressions as batch — so the appended union of all drains
    * is row-for-row the batch output under the same oracle. State per
    * key: 5 closed rows + the open tail; bounded by the watermark delay.
    * Keying: per (service, SLO) in deployment — each key's state and
    * emission are independent, so alert cardinality scales with the key
    * space, not the event volume. */
  def burnRateStream(events: DataFrame, budget: Double,
      watermark: String): Dataset[BurnRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def fn(key: String, evs: Iterator[BurnIn],
        state: GroupState[BurnBuf]): Iterator[BurnRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(BurnBuf(Nil, Map.empty))
      var pending = st.pending
      evs.foreach { e =>
        val h = e.us - java.lang.Math.floorMod(e.us, hourUs)
        val (n0, e0) = pending.getOrElse(h, (0L, 0L))
        pending = pending.updated(h, (n0 + 1L, e0 + (if (e.isErr) 1L else 0L)))
      }
      val (closed, open) = pending.partition(_._1 + hourUs <= wmUs)
      var last5 = st.last5
      val out = Seq.newBuilder[BurnRow]
      closed.toSeq.sortBy(_._1).foreach { case (h, (n, nerr)) =>
        val n6 = n + last5.map(_._2).sum
        val e6 = nerr + last5.map(_._3).sum
        out += BurnRow(key, h, n, nerr,
          (nerr.toDouble / n) / budget, (e6.toDouble / n6) / budget)
        last5 = ((h, n, nerr) :: last5).take(5)
      }
      if (open.isEmpty && last5.isEmpty) state.remove()
      else {
        state.update(BurnBuf(last5, open))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      out.result().iterator
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("is_err").cast("boolean").as("isErr"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[BurnIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming gapfill with LINEAR interpolation — the batch q116
    * operator (TimescaleDB continuous-aggregate `interpolate`) maintained
    * incrementally: per series, hourly buckets; an observed bucket emits
    * its mean when the watermark closes it, and an EMPTY bucket emits the
    * line between its surrounding observed buckets the moment the RIGHT
    * endpoint closes (the left one closed earlier — drains are
    * watermark-monotone, so by then every bucket between the endpoints is
    * provably empty). Buckets before the first / after the last
    * observation never materialize, exactly the batch series' min..max
    * span. Per-bucket means go through the same 2-dp decimal summation as
    * the batch `dsum` (order-independent), and the interpolation is the
    * identical double expression, so the union of all drains is bit-equal
    * to the batch rows and sits under the same DuckDB oracle. State per
    * key: the last closed observed bucket plus the open tail — bounded by
    * the watermark delay, never by stream length. */
  def gapfillInterpStream(events: DataFrame,
      watermark: String): Dataset[GapfillRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def fn(key: String, evs: Iterator[GapfillIn],
        state: GroupState[GapfillBuf]): Iterator[GapfillRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(GapfillBuf(None, Map.empty))
      var pending = st.pending
      evs.foreach { e =>
        val b = e.us - java.lang.Math.floorMod(e.us, hourUs)
        val cents = java.math.BigDecimal.valueOf(e.value)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        val (c0, n0) = pending.getOrElse(b, (0L, 0L))
        pending = pending.updated(b, (c0 + cents, n0 + 1L))
      }
      // a bucket closes when its END is ≤ the watermark: any further
      // arrival for it would be strictly older than the watermark and is
      // dropped by Spark's late-row filter, so "absent from pending and
      // closed" proves the bucket empty
      val (closed, open) = pending.partition(_._1 + hourUs <= wmUs)
      var lastObs = st.lastObs
      val out = Seq.newBuilder[GapfillRow]
      closed.toSeq.sortBy(_._1).foreach { case (b, (cents, n)) =>
        val v = (cents / 100.0) / n
        lastObs.foreach { case (pb, pv) =>
          var e = pb + hourUs
          while (e < b) {
            out += GapfillRow(key, e, filled = true,
              pv + (v - pv) * ((e - pb).toDouble / (b - pb)))
            e += hourUs
          }
        }
        out += GapfillRow(key, b, filled = false, v)
        lastObs = Some((b, v))
      }
      if (open.isEmpty && lastObs.isEmpty) state.remove()
      else {
        state.update(GapfillBuf(lastObs, open))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      out.result().iterator
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[GapfillIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming per-series EWMA — the batch q108 recursion
    * (s_t = α·x_t + (1−α)·s_{t−1}, seeded at the first point) maintained
    * incrementally. A point folds exactly once, when the watermark
    * guarantees no earlier point can still arrive; each drain folds its
    * ready points in (event-time, id) order — the same total order as the
    * batch operator's sorted array, drains are watermark-monotone, and the
    * per-step arithmetic is the identical double expression, so the final
    * snapshot per key is bit-equal to the batch fold (and sits under the
    * same DuckDB `list_reduce` oracle). Emission on both paths: new
    * batches for active keys, event-time timeout so buffered keys drain on
    * pure watermark advance. */
  def ewmaStream(events: DataFrame, alpha: Double,
      watermark: String): Dataset[EwmaSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(key: String, evs: Iterator[EwmaIn],
        state: GroupState[EwmaBuf]): Iterator[EwmaSnap] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(EwmaBuf(None, 0L, Nil))
      val pending = st.pending ++ evs.map(e => (e.us, e.id, e.value))
      // STRICT <: Spark's late-row filter drops only rows strictly older
      // than the watermark, so a peer with event time == watermark (and a
      // smaller tiebreak id) can still be admitted in a later drain —
      // folding the boundary point now would break (ts, id) total order
      // and with it the bit-equality to the batch fold
      val (ready, rest) = pending.partition(_._1 < wmUs)
      var acc = st.acc
      var n = st.n
      ready.sortBy(p => (p._1, p._2)).foreach { case (_, _, x) =>
        acc = Some(acc match {
          case None => x
          case Some(a) => alpha * x + (1.0 - alpha) * a
        })
        n += 1L
      }
      if (rest.isEmpty && acc.isEmpty) state.remove()
      else {
        state.update(EwmaBuf(acc, n, rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      }
      if (ready.nonEmpty) Iterator.single(EwmaSnap(key, n, acc.get))
      else Iterator.empty
    }
    events
      .select(col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("id").cast("long").as("id"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .as[EwmaIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
