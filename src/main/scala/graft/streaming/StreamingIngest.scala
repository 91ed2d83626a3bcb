package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.GraftTable

/** Structured-Streaming ingest into a [[GraftTable]] — the Spark rendering
  * of the reference's WAL → MemBuffer → flush pipeline (SURVEY.md §2.10
  * W1–W5; `/root/reference/src/buffered_write_layer.rs:1120,2211`,
  * `src/wal.rs`):
  *
  *  - the streaming checkpoint plays the WAL's role: offsets are committed
  *    only after the batch lands, so a crash replays the in-flight batch
  *    (`recover_from_wal`, `buffered_write_layer.rs:1256`);
  *  - each micro-batch is dedup'd in-batch on the table's dedup keys
  *    (reference `dedup_batches`, `src/mem_buffer.rs:637`), then appended
  *    through [[GraftTable.append]], which sorts by the declared sort keys —
  *    the flush-time sort of W3;
  *  - **version stamps are wall-clock, recorded per batch in the
  *    checkpoint** (`<checkpoint>/graft_stamps/bNNN`, one atomic
  *    create-exclusive per micro-batch): the first processing of a batch
  *    mints `now()` and persists it; a crash replay of the same batch reads
  *    the recorded stamp back and appends byte-identical row versions,
  *    which the merge-on-read view collapses — at-least-once delivery
  *    converges to exactly-once READS without a transactional sink. This is
  *    the WAL's write-timestamp column re-expressed on Spark's checkpoint.
  *
  * Wall-clock stamps (rather than a synthetic per-batch epoch) are what
  * make streamed and interactive writes COMMUTE: [[GraftTable]] stamps
  * interactive DML with `now()`, so on a table fed by both paths the
  * keep-greatest tiebreak resolves to the true last writer in either
  * direction. A synthetic epoch would lose every streamed version to any
  * historical interactive write — the round-2 ordering trap.
  *
  * Divergence from the reference, documented: in-batch dedup keeps the
  * lexicographically-greatest payload rather than the last arrival —
  * micro-batch DataFrames have no stable arrival order, and a deterministic
  * winner is what makes replays idempotent.
  */
object StreamingIngest {

  /** Keep one row per dedup key: the lexicographically-greatest non-key
    * payload (deterministic under replays and reshuffles, unlike
    * `dropDuplicates`). */
  def dedupBatch(batch: DataFrame, keys: Seq[String]): DataFrame = {
    if (keys.isEmpty) return batch // insert-only table: no row identity
    val others = batch.columns.filterNot(keys.contains).toSeq
    if (others.isEmpty) batch.distinct()
    else batch.groupBy(keys.map(col): _*)
      .agg(max(struct(others.map(col): _*)).as("__p"))
      .select(keys.map(col) ++ others.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** The batch's version stamp: minted from the (test-injectable) clock on
    * first processing, persisted next to the offset log, read back on
    * replay. The create-exclusive call is the atomic claim — a racing
    * duplicate processing of the same batch id loses the create and adopts
    * the winner's stamp. One driver-side RPC per micro-batch. */
  private[graft] def persistedStamp(table: GraftTable, checkpoint: String,
      batchId: Long): java.time.LocalDateTime = {
    val dir = new Path(checkpoint, "graft_stamps")
    val fs = dir.getFileSystem(table.spark.sparkContext.hadoopConfiguration)
    val f = new Path(dir, f"b$batchId%010d")
    def read(): java.time.LocalDateTime = {
      val in = fs.open(f)
      try java.time.LocalDateTime.parse(
        new String(in.readAllBytes(), UTF_8).trim)
      finally in.close()
    }
    if (fs.exists(f)) read()
    else {
      val m = graft.functions.GraftClock.nowMicros
      val stamp = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(m, 1000000L), (Math.floorMod(m, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      fs.mkdirs(dir)
      // publish by RENAME of a fully-written temp file, not by writing
      // into the claimed path: a racer reading between create and write
      // would otherwise parse an empty stamp. Whatever file sits at `f`
      // after the rename attempt is canonical for every processor.
      val tmp = new Path(dir,
        f".b$batchId%010d.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(stamp.toString.getBytes(UTF_8)) finally out.close()
      if (!fs.rename(tmp, f)) fs.delete(tmp, false)
      read()
    }
  }

  /** Start the ingest stream. `source` is any streaming DataFrame conforming
    * to (a subset of) the table schema; `checkpoint` must be stable across
    * restarts — it carries the offset log that makes recovery exact plus
    * the per-batch stamp log that makes replays idempotent. `stamp`
    * overrides the stamp source for deterministic tests.
    *
    * `sweepEvery = n` runs [[GraftTable.maintenanceSweep]] after every
    * n-th micro-batch — the reference's background compaction loop riding
    * the ingest cadence (W6): the trailing days a stream fragments fold
    * back into partial bases while the stream runs, so read latency under
    * ingest stays flat instead of growing with the commit count. The sweep
    * replays safely (compaction is view-invariant and idempotent).
    *
    * `coalescer`: deferred-DML drain riding the same cadence — after each
    * batch commit, `drainIfDue()` folds any aged update groups into the
    * table (the reference's coalescer drain loop runs beside ingest the
    * same way; see [[graft.sources.DmlCoalescer]]). Coalesced updates are
    * idempotent under replay by the coalescer's own contract.
    *
    * `hotTier`: demotion riding the flush, the reference's population
    * model (`hot_tier.rs` demotes what the flush just wrote). Each batch
    * commit offers the new version to the tier; under sustained churn the
    * tier's own waste accounting convicts the table and the per-batch call
    * degrades to a suppressed no-op — exactly the adaptive-suppression
    * story, now attached to the real ingest cadence. */
  def start(table: GraftTable, source: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      stamp: Option[Long => java.time.LocalDateTime] = None,
      sweepEvery: Int = 0,
      coalescer: Option[graft.sources.DmlCoalescer] = None,
      hotTier: Option[graft.sources.HotTier] = None): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = stamp.map(_(batchId))
          .getOrElse(persistedStamp(table, checkpoint, batchId))
        table.append(dedupBatch(batch, table.meta.dedupKeys), Some(st))
        if (sweepEvery > 0 && batchId > 0 && batchId % sweepEvery == 0) {
          table.maintenanceSweep()
          ()
        }
        coalescer.foreach(_.drainIfDue())
        hotTier.foreach(_.demote())
      }
      .start()
}
