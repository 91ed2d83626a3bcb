package graft.streaming

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
  * (`__tk IN (...)` reaches the parquet reader: bloom + row-group stats
  * on the sorted key column skip non-matching groups), and
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
  * Segment maintenance (LSM binary-counter merges, multi-file
  * range-partitioned segments), the crash-safe commit/adoption protocol,
  * and DML tombstones (a deleted survivor stops suppressing immediately,
  * merges compact dead rows, full merges clear the set) live in
  * [[LsmSegmentIndex]], shared with [[TextIngestIndex]].
  *
  * Ordering contract: [[probe]] returns a LAZY frame over the current
  * segment files; a subsequent [[add]] may LSM-merge and DELETE absorbed
  * segment directories, so the probe result must be fully consumed (or
  * pinned via `localCheckpoint()`) BEFORE the next add/remove. The q148
  * pipeline materializes within the batch, which satisfies this. */
final class AnnIngestIndex(spark: SparkSession, root: String,
    idCol: String, vecCol: String, dim: Int, threshold: Double,
    planesPerTable: Int = 12, numTables: Int = 10, seed: Long = 97L,
    maxProbeKeys: Int = -1)
  extends LsmSegmentIndex(spark, root) {

  /** Resolved driver-side key bound: explicit ctor arg > env > conf >
    * derived (see [[graft.Autotune.ingestIndexMaxProbeKeys]]) — bounds
    * plan size (a long literal each) and driver memory, per VERDICT r11
    * §1(b). */
  private val keyBound =
    if (maxProbeKeys > 0) maxProbeKeys
    else graft.Autotune.ingestIndexMaxProbeKeys(20000,
      spark.conf.getOption("spark.graft.ingestIndex.maxProbeKeys"))

  protected def segmentIdCol: String = "base_id"

  protected def writeSegmentPayload(frame: DataFrame, dir: String,
      n: Long): Unit =
    SegmentWriter.writeSorted(frame, dir, n, "__tk")

  protected def readSegmentRows(dir: String): DataFrame =
    spark.read.parquet(dir)

  protected def segmentRowCount(dir: String): Long =
    spark.read.parquet(dir).count()

  adoptExisting()

  private def buckets(df: DataFrame, as: String): DataFrame =
    graft.operators.VectorSearch.signatureBuckets(df, idCol, vecCol, dim,
      planesPerTable, numTables, seed)
      .select(col(idCol).as(as), col("__tk"), col("__v"))

  /** Fold a batch of keepers into the index: write their bucket rows as
    * one key-sorted segment, then binary-counter-merge. Returns the rows
    * written by this add (batch + any merge rewrite). */
  def add(keepers: DataFrame): Long = synchronized {
    val rows = buckets(keepers, "base_id").localCheckpoint()
    val n = rows.count()
    if (n == 0) 0L else foldIn(rows, n)
  }

  /** Tombstone survivor ids: they stop suppressing new ingest from the
    * next [[probe]], and merges drop their bucket rows physically.
    * Idempotent — removing an id twice (or an id never indexed) is a
    * no-op. `ids` carries one column named `idCol`. */
  def remove(ids: DataFrame): Unit = tombstoneIds(ids.select(col(idCol)))

  /** Verified near-dup pairs between the batch and every indexed,
    * non-tombstoned keeper: `(new_id, base_id, cosine)` with cosine ≥
    * threshold — exactly
    * [[graft.operators.VectorSearch.cosineNearDupPairsAgainst]]'s
    * contract. Only the BATCH is bucketized; the index is read through
    * its pushed key filter and never shuffled (batch side broadcasts).
    *
    * The key set reaches the driver bounded by the resolved key bound:
    * below
    * the bound it becomes a NATIVE parquet `In` predicate (bloom +
    * row-group stats prune per group); above it the literal plan would
    * blow up — a 1M-row batch × 10 tables is 10M plan literals — so the
    * probe falls back to the broadcast hash join alone (the join IS the
    * filter; correctness identical, file/row-group pruning forgone for
    * that batch).
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
    val dirs = residentSegmentDirs
    if (dirs.isEmpty) return empty
    val b = buckets(batch, "new_id").localCheckpoint()
    val keyRows = collectBounded(b, "__tk", keyBound)
    if (keyRows.isEmpty) return empty
    val pushed = keyRows.length <= keyBound
    recordProbePath(pushed)
    val scan = spark.read.parquet(dirs: _*)
    val base0 =
      if (pushed)
        // NATIVE In pushdown: above
        // spark.sql.parquet.pushdown.inFilterThreshold (default 10) Spark
        // pushes FilterApi.in with a sorted value set — row-group stats
        // prune against the set's range per group. Do NOT raise that
        // threshold: below it the pushdown is a recursively-evaluated
        // OR-of-equalities chain, which overflows the task stack at a few
        // hundred keys (measured: StackOverflowError at ~700).
        scan.where(col("__tk").isin(keyRows.map(_.getLong(0)).toSeq: _*))
      else scan
    val base = antiTombstoned(
      base0.select(col("base_id"), col("__tk"), col("__v").as("__bv")),
      "base_id")
    broadcast(b).join(base, "__tk")
      .withColumn("cosine",
        graft.operators.VectorSearch.cosine(col("__v"), col("__bv"), dim))
      .filter(col("cosine") >= threshold)
      .select(col("new_id"), col("base_id"), col("cosine"))
      .distinct()
  }

  /** Bucket rows currently indexed. */
  def indexedRows: Long = indexedTotal

  /** Total rows ever written (adds + merge rewrites) — the amortized
    * O(rows · log batches) maintenance quantity. */
  def writtenRowsTotal: Long = writtenTotal
}
