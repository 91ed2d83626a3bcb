package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained ANN index over ingest-time dedup survivors —
  * the production next step past re-bucketing the whole committed base
  * every micro-batch (reference analogue: the tantivy sidecar's
  * incremental segment adds, `docs/ARCHITECTURE.md` text-index section).
  *
  * Each batch's keepers are written as ONE key-sorted parquet segment of
  * sign-plane bucket rows (`__tk`-packed table+key, id, vector — see
  * [[graft.operators.VectorSearch.signatureBuckets]]); a probe bucketizes
  * ONLY the incoming batch, pushes its bucket keys into the segment scan
  * (`__tk IN (...)` reaches the parquet reader: row-group stats on the
  * sorted key column skip non-matching groups, and row groups are kept
  * small via `parquet.block.size` so skipping has granularity), and
  * exact-verifies cosine on the matches. The committed base is NEVER
  * re-hashed and never shuffled — the batch side broadcasts into the
  * filtered segment scan. Against the brute per-batch bucket-join this
  * removes the O(base × tables) signature recompute and the base-side
  * exchange from every micro-batch; probe IO scales with the batch's
  * bucket mass (keys × bucket depth), not the corpus.
  *
  * The sign-plane family is seed-fixed and data-independent, so rows
  * indexed batches ago bucket identically to today's probes — no
  * retrain-on-drift question, which is why an ingest-side index prefers
  * LSH buckets over IVF cells (whose centroids age as the distribution
  * moves). Output is verified-exact, so it EQUALS
  * [[graft.operators.VectorSearch.cosineNearDupPairsAgainst]] with the
  * same family parameters (spec-pinned) — recall vs the brute probe is
  * 1.0 by construction, not an approximation knob.
  *
  * Segments merge LSM-style (binary counter, the [[PinnedBase]]
  * discipline): an add absorbs every segment no larger than itself, so
  * a long drain keeps ≤ log₂(batches) segments (bounded footer reads
  * per probe) and each row is rewritten at most log₂(batches) times.
  * Segments are MULTI-file: each is range-partitioned on the sort key
  * into ~[[AnnIngestIndex.RowsPerFile]]-row sorted files, so the
  * largest LSM merge writes with cluster-wide parallelism instead of
  * one serial task, and the probe's key filter still prunes per file
  * (range-disjoint files → footer min/max) and per row group within it.
  *
  * Restart: a new instance over a non-empty root ADOPTS the on-disk
  * `seg_*` directories (sizes from footer counts, the WAL-recovery
  * discipline) — a restarted stream probes the full committed base
  * rather than silently starting empty over leaked segments.
  *
  * DML interaction: [[remove]] tombstones survivor ids. Probes anti-join
  * matches against the tombstone set (a deleted survivor stops
  * suppressing new ingest immediately) and merges physically drop dead
  * rows (compaction) — tombstones are kept (idempotent re-delete), so a
  * replayed remove or a merge racing a remove cannot resurrect a row.
  *
  * Ordering contract: [[probe]] returns a LAZY frame over the current
  * segment files; a subsequent [[add]] may LSM-merge and DELETE absorbed
  * segment directories, so the probe result must be fully consumed (or
  * pinned via `localCheckpoint()`) BEFORE the next add/remove. The q148
  * pipeline materializes within the batch, which satisfies this. */
final class AnnIngestIndex(spark: SparkSession, root: String,
    idCol: String, vecCol: String, dim: Int, threshold: Double,
    planesPerTable: Int = 12, numTables: Int = 10, seed: Long = 97L,
    maxProbeKeys: Int = AnnIngestIndex.DefaultMaxProbeKeys) {

  // newest-first (segment dir, bucket rows); sizes increase tail-ward
  private var segments: List[(String, Long)] = Nil
  private var segSeq = 0
  private var rowsWrittenTotal = 0L
  // pinned tombstoned ids (one column named like idCol); None = empty
  private var tombstones: Option[DataFrame] = None
  // introspection for specs: did the last probe use the pushed-In path?
  @volatile private[graft] var lastProbePushedKeys = false

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- restart recovery: adopt what a predecessor left on disk --------
  locally {
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      val segs = fs.listStatus(rootPath).filter(_.isDirectory)
        .map(_.getPath).filter(_.getName.startsWith("seg_"))
      if (segs.nonEmpty) {
        // footer-count sizes (parquet count() is a metadata read); order
        // smallest-first head-ward so the binary-counter invariant
        // (sizes increase tail-ward) holds for the adopted list
        val adopted = segs.toList.map { p =>
          (p.toString, spark.read.parquet(p.toString).count())
        }.sortBy(_._2)
        segments = adopted
        segSeq = segs.map(_.getName.stripPrefix("seg_").toInt).max + 1
      }
      val tombDir = new Path(rootPath, "_tombstones")
      if (fs.exists(tombDir) && fs.listStatus(tombDir).exists(f =>
          f.getPath.getName.endsWith(".parquet") ||
            f.getPath.getName == "_SUCCESS"))
        tombstones = Some(
          spark.read.parquet(tombDir.toString).localCheckpoint())
    }
  }

  private def buckets(df: DataFrame, as: String): DataFrame =
    graft.operators.VectorSearch.signatureBuckets(df, idCol, vecCol, dim,
      planesPerTable, numTables, seed)
      .select(col(idCol).as(as), col("__tk"), col("__v"))

  /** Fold a batch of keepers into the index: write their bucket rows as
    * one key-sorted segment, then binary-counter-merge. Returns the rows
    * written by this add (batch + any merge rewrite). */
  def add(keepers: DataFrame): Long = synchronized {
    val rows = buckets(keepers, "base_id").localCheckpoint()
    var n = rows.count()
    if (n == 0) return 0L
    var frame = rows
    // absorb every resident segment no larger than the incoming rows
    var absorbed = List.empty[String]
    while (segments.nonEmpty && segments.head._2 <= n) {
      val (dir, m) = segments.head
      segments = segments.tail
      n += m
      absorbed ::= dir
      frame = frame.unionByName(spark.read.parquet(dir))
    }
    // compaction: a merge rewrite drops tombstoned rows for good (the
    // probe-side anti-join already hides them; this reclaims the bytes)
    if (absorbed.nonEmpty) tombstones.foreach { t =>
      frame = frame.join(
        broadcast(t.select(col(idCol).as("base_id"))),
        Seq("base_id"), "left_anti")
    }
    val dir = f"$root/seg_$segSeq%06d"
    segSeq += 1
    writeSorted(frame, dir, n)
    absorbed.foreach(d => fs.delete(new Path(d), true))
    // re-count only when compaction may have dropped rows — the segment
    // size steers the binary counter, so it must reflect what's on disk
    val written =
      if (absorbed.nonEmpty && tombstones.isDefined)
        spark.read.parquet(dir).count()
      else n
    segments = (dir, written) :: segments
    rowsWrittenTotal += written
    written
  }

  private def writeSorted(frame: DataFrame, dir: String, n: Long): Unit =
    SegmentWriter.writeSorted(frame, dir, n, "__tk")

  /** Tombstone survivor ids: they stop suppressing new ingest from the
    * next [[probe]], and merges drop their bucket rows physically.
    * Idempotent — removing an id twice (or an id never indexed) is a
    * no-op. `ids` carries one column named `idCol`. */
  def remove(ids: DataFrame): Unit = synchronized {
    val t = ids.select(col(idCol)).distinct()
    val dir = s"$root/_tombstones"
    // append durably (restart adopts), keep a pinned union for probes
    t.write.mode("append").parquet(dir)
    tombstones = Some(tombstones match {
      case Some(prev) => prev.unionByName(t).distinct().localCheckpoint()
      case None => t.localCheckpoint()
    })
  }

  /** Verified near-dup pairs between the batch and every indexed,
    * non-tombstoned keeper: `(new_id, base_id, cosine)` with cosine ≥
    * threshold — exactly
    * [[graft.operators.VectorSearch.cosineNearDupPairsAgainst]]'s
    * contract. Only the BATCH is bucketized; the index is read through
    * its pushed key filter and never shuffled (batch side broadcasts).
    *
    * The key set reaches the driver bounded by [[maxProbeKeys]]: below
    * the bound it becomes a NATIVE parquet `In` predicate (row-group
    * stats prune against the sorted set's range per group); above it the
    * literal plan would blow up — a 1M-row batch × 10 tables is 10M plan
    * literals — so the probe falls back to the broadcast hash join alone
    * (the join IS the filter; correctness identical, file/row-group
    * pruning forgone for that batch).
    *
    * LAZY — consume (or pin) before the next [[add]], which may delete
    * merged segment directories out from under this plan. */
  def probe(batch: DataFrame): DataFrame = synchronized {
    // empty frame typed from the batch itself, so new_id/base_id carry
    // idCol's real type in BOTH the empty- and non-empty-index states
    val empty = batch
      .select(col(idCol).as("new_id"), col(idCol).as("base_id"),
        lit(0.0).as("cosine"))
      .filter(lit(false))
    lastProbePushedKeys = false
    if (segments.isEmpty) return empty
    val b = buckets(batch, "new_id").localCheckpoint()
    val keyRows = b.select("__tk").distinct()
      .limit(maxProbeKeys + 1).collect()
    if (keyRows.isEmpty) return empty
    val scan = spark.read.parquet(segments.map(_._1): _*)
    val base0 =
      if (keyRows.length <= maxProbeKeys) {
        lastProbePushedKeys = true
        // NATIVE In pushdown: above
        // spark.sql.parquet.pushdown.inFilterThreshold (default 10) Spark
        // pushes FilterApi.in with a sorted value set — row-group stats
        // prune against the set's range per group. Do NOT raise that
        // threshold: below it the pushdown is a recursively-evaluated
        // OR-of-equalities chain, which overflows the task stack at a few
        // hundred keys (measured: StackOverflowError at ~700).
        scan.where(col("__tk").isin(keyRows.map(_.getLong(0)).toSeq: _*))
      } else scan
    val base1 = base0
      .select(col("base_id"), col("__tk"), col("__v").as("__bv"))
    val base = tombstones match {
      case Some(t) => base1.join(
        broadcast(t.select(col(idCol).as("base_id"))),
        Seq("base_id"), "left_anti")
      case None => base1
    }
    broadcast(b).join(base, "__tk")
      .withColumn("cosine",
        graft.operators.VectorSearch.cosine(col("__v"), col("__bv"), dim))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("base_id"), col("cosine"))
      .distinct()
  }

  /** Resident segment count — ≤ log₂(batches)+1 under equal-sized adds. */
  def segmentCount: Int = synchronized(segments.length)

  /** Bucket rows currently indexed. */
  def indexedRows: Long = synchronized(segments.map(_._2).sum)

  /** Total rows ever written (adds + merge rewrites) — the amortized
    * O(rows · log batches) maintenance quantity. */
  def writtenRowsTotal: Long = synchronized(rowsWrittenTotal)
}

object AnnIngestIndex {
  /** Probe keys collected to the driver before falling back from the
    * pushed-In scan to the plain broadcast join — bounds plan size (a
    * long literal each) and driver memory, per VERDICT r11 §1(b). */
  val DefaultMaxProbeKeys = 20000
}
