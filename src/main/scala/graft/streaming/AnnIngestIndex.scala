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
  * per probe) and each row is rewritten at most log₂(batches) times. */
final class AnnIngestIndex(spark: SparkSession, root: String,
    idCol: String, vecCol: String, dim: Int, threshold: Double,
    planesPerTable: Int = 12, numTables: Int = 10, seed: Long = 97L) {

  // newest-first (segment dir, bucket rows); sizes increase tail-ward
  private var segments: List[(String, Long)] = Nil
  private var segSeq = 0
  private var rowsWrittenTotal = 0L

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

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
    val dir = f"$root/seg_$segSeq%06d"
    segSeq += 1
    // ONE sorted file, small row groups: the probe's IN filter prunes at
    // row-group granularity, and a sorted segment keeps each bucket's
    // rows contiguous so a probed key touches O(depth/rowsPerGroup)
    // groups instead of all of them
    frame.repartition(1).sortWithinPartitions("__tk")
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(dir)
    absorbed.foreach(d => fs.delete(new Path(d), true))
    segments = (dir, n) :: segments
    rowsWrittenTotal += n
    n
  }

  /** Verified near-dup pairs between the batch and every indexed keeper:
    * `(new_id, base_id, cosine)` with cosine ≥ threshold — exactly
    * [[graft.operators.VectorSearch.cosineNearDupPairsAgainst]]'s
    * contract. Only the BATCH is bucketized; the index is read through
    * its pushed key filter and never shuffled (batch side broadcasts).
    * The key collect is bounded by batch × numTables — the same
    * boundedness class as the CC driver gate's audited collects. */
  def probe(batch: DataFrame): DataFrame = synchronized {
    val empty = batch.sparkSession.emptyDataFrame
      .select(lit(0L).as("new_id"), lit(0L).as("base_id"),
        lit(0.0).as("cosine")).filter(lit(false))
    if (segments.isEmpty) return empty
    val b = buckets(batch, "new_id").localCheckpoint()
    val keys = b.select("__tk").distinct().collect().map(_.getLong(0))
    if (keys.isEmpty) return empty
    // the key set reaches parquet as a NATIVE In predicate: above
    // spark.sql.parquet.pushdown.inFilterThreshold (default 10) Spark
    // pushes FilterApi.in with a sorted value set — row-group stats
    // prune against the set's range per group. Do NOT raise that
    // threshold: below it the pushdown is a recursively-evaluated
    // OR-of-equalities chain, which overflows the task stack at a few
    // hundred keys (measured: StackOverflowError at ~700).
    val base = spark.read.parquet(segments.map(_._1): _*)
      .where(col("__tk").isin(keys.toSeq: _*))
      .select(col("base_id"), col("__tk"), col("__v").as("__bv"))
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
