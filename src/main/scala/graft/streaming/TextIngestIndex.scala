package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained EXACT-Jaccard index over ingest-time dedup
  * survivors — the text twin of [[AnnIngestIndex]] (VERDICT r11 next
  * round #1), replacing the per-batch corpus-sized probe of
  * `jaccardPairsAgainstSets` (which re-buckets the full base's hashed
  * sets and re-runs the corpus-wide rarity-order frequency pass on
  * every micro-batch) with key-sorted parquet segments probed through
  * pushed key filters. Reference analogue: the tantivy sidecar's
  * incremental segment adds (`docs/ARCHITECTURE.md` text-index section).
  *
  * Why not LSH band keys, like the vector index? Banding is
  * probabilistic — a qualifying pair can miss every band — and the
  * q126 oracle replays the GLOBAL exact pair graph, so the index must
  * be lossless. The exact analogue of a seed-fixed bucket family is the
  * PPJoin PREFIX FILTER under a FROZEN total order: the filter is
  * provably candidate-lossless for ANY total order both sides share, so
  * each segment freezes ITS rarity order (document frequency over the
  * segment's docs, ties by token hash) at build time. A probe then
  * sorts the batch's sets under each segment's frozen order — tokens
  * the segment has never seen take frequency 0, i.e. rarest-first,
  * which is both consistent (base docs contain only seen tokens, so
  * their frozen sort is unaffected) and maximally pruning (an unseen
  * token in a batch prefix matches nothing). Per-segment exactness
  * unions to whole-base exactness because every committed doc lives in
  * exactly one segment; spec-pinned EQUAL to
  * [[graft.operators.TextDedup.jaccardPairsAgainstSets]].
  *
  * Segment layout (each `seg_NNNNNN/`):
  *  - `vocab/`: `(__pe, __f)` — the frozen document frequencies, sorted
  *    by token hash. A probe reads it through a pushed `__pe IN (batch
  *    tokens)` filter to rank the batch's tokens: batch-sized IO, never
  *    vocabulary-sized.
  *  - `pref/`: `(__pe, __id, __n, blockCols…)` — the base docs' prefix
  *    rows under the frozen order, sorted by `__pe`. Probed with the
  *    same pushed token filter: only base prefix rows whose token occurs
  *    somewhere in the batch are ever read.
  *  - `sets/`: `(__id, __n, __ts, blockCols…)` — full hashed token
  *    sets, sorted by `__id`, read only for verification through a
  *    pushed id filter on the (output-sized) candidate base ids.
  *
  * So the per-batch probe cost is: batch tokenization + three pruned
  * scans whose volume follows the BATCH's token/candidate mass — the
  * base is never re-hashed, never re-shuffled, and its text never
  * re-scanned. Maintenance is the [[PinnedBase]]/[[AnnIngestIndex]]
  * LSM binary counter: an add absorbs every segment no larger than
  * itself and recomputes the merged segment's frozen order over its
  * own rows (O(segment) at merge time, amortized O(log batches) per
  * doc); ≤ log₂(batches) resident segments bound probe plan width.
  *
  * Restart: a new instance adopts on-disk `seg_*` dirs (complete ones —
  * a crash mid-add leaves a partial segment, which is deleted, and its
  * rows are simply re-added when the stream's checkpoint replays the
  * batch). Ordering contract as [[AnnIngestIndex]]: consume (or pin) a
  * probe result before the next add, which may delete merged segments. */
final class TextIngestIndex(spark: SparkSession, root: String,
    blockCols: Seq[String], threshold: Double,
    maxProbeKeys: Int = TextIngestIndex.DefaultMaxProbeKeys) {
  require(threshold > 0.0 && threshold <= 1.0,
    s"jaccard threshold must be in (0, 1], got $threshold")

  // newest-first (segment dir, doc count); sizes increase tail-ward
  private var segments: List[(String, Long)] = Nil
  private var segSeq = 0
  private var docsWrittenTotal = 0L
  @volatile private[graft] var lastProbePushedKeys = false

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- restart recovery ------------------------------------------------
  locally {
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      val segs = fs.listStatus(rootPath).filter(_.isDirectory)
        .map(_.getPath).filter(_.getName.startsWith("seg_"))
      val (complete, partial) = segs.partition(p =>
        Seq("vocab", "pref", "sets").forall(s =>
          fs.exists(new Path(new Path(p, s), "_SUCCESS"))))
      partial.foreach(fs.delete(_, true)) // crash mid-add: replay re-adds
      if (complete.nonEmpty) {
        val adopted = complete.toList.map { p =>
          (p.toString, spark.read.parquet(s"$p/sets").count())
        }.sortBy(_._2) // smallest-first head-ward: binary-counter invariant
        segments = adopted
        segSeq = complete.map(_.getName.stripPrefix("seg_").toInt).max + 1
      }
    }
  }

  /** `(__id, __n, __ts, blockCols…)` with empty sets dropped — both
    * sides of every comparison pass through this, mirroring the batch
    * path's `toks` in [[graft.operators.TextDedup]]. */
  private def withN(sets: DataFrame): DataFrame =
    sets.filter(size(col("__ts")) > 0)
      .withColumn("__n", size(col("__ts")))

  /** Prefix rows of `t` (= [[withN]] shape + `__f`-ranked exploded
    * tokens) under the (frequency, token-hash) total order — the SAME
    * slice/length expressions as the live `setJaccardJoin.pref`, so the
    * frozen-order index and the recompute-every-batch join cannot
    * disagree on what a prefix is. */
  private def prefixRows(tokens: DataFrame): DataFrame =
    tokens
      .groupBy(Seq(col("__id"), col("__n")) ++ blockCols.map(col): _*)
      .agg(slice(array_sort(collect_list(struct(col("__f"), col("__pe")))),
        lit(1),
        (col("__n") - ceil(col("__n") * threshold) + 1).cast("int"))
        .as("__pref"))
      .select(Seq(col("__id"), col("__n"),
        explode(col("__pref.__pe")).as("__pe")) ++ blockCols.map(col): _*)

  /** Fold a batch of keepers' hashed-set rows (`(__id, __ts,
    * blockCols…)`, the [[graft.operators.TextDedup.hashedSets]] shape)
    * into the index. Returns doc rows written by this add (batch + any
    * merge rewrite). */
  def add(keeperSets: DataFrame): Long = synchronized {
    val batch = graft.operators.Pin(withN(keeperSets)
      .select(Seq(col("__id"), col("__n"), col("__ts")) ++
        blockCols.map(col): _*))
    var n = batch.count()
    if (n == 0) return 0L
    var frame = batch
    var absorbed = List.empty[String]
    while (segments.nonEmpty && segments.head._2 <= n) {
      val (dir, m) = segments.head
      segments = segments.tail
      n += m
      absorbed ::= dir
      frame = frame.unionByName(spark.read.parquet(s"$dir/sets"))
    }
    val dir = f"$root/seg_$segSeq%06d"
    segSeq += 1
    // freeze THIS segment's rarity order: document frequency over its
    // own rows. Written first and read back so the pref build consumes
    // exactly what probes will see (one materialization, no recompute
    // drift between the vocab job and the pref job).
    val instances = frame.select(col("__id"),
      explode(col("__ts")).as("__pe"))
    val freq = instances.groupBy("__pe").agg(count(lit(1)).as("__f"))
    SegmentWriter.writeSorted(freq, s"$dir/vocab",
      n * 64, "__pe") // vocab rows ≈ tokens; 64/doc is a sizing guess only
    val vocab = spark.read.parquet(s"$dir/vocab")
    val ranked = frame
      .select(Seq(col("__id"), col("__n"),
        explode(col("__ts")).as("__pe")) ++ blockCols.map(col): _*)
      .join(vocab, "__pe")
    SegmentWriter.writeSorted(prefixRows(ranked), s"$dir/pref",
      n * 16, "__pe") // ≈ (1−t)·tokens prefix rows per doc
    SegmentWriter.writeSorted(frame, s"$dir/sets", n, "__id")
    absorbed.foreach(d => fs.delete(new Path(d), true))
    segments = (dir, n) :: segments
    docsWrittenTotal += n
    n
  }

  /** Exact-Jaccard near-dup pairs between the batch's hashed-set rows
    * and every indexed keeper: `(new_id, base_id, jaccard)` with
    * jaccard ≥ threshold and matching blockCols — exactly
    * [[graft.operators.TextDedup.jaccardPairsAgainstSets]]'s contract
    * (spec-pinned equal). Only the BATCH is tokenized and ranked; each
    * segment is read through pushed key filters. Driver-side key sets
    * are bounded by [[maxProbeKeys]] — above the bound the scans run
    * unfiltered and the joins do the filtering (correctness identical,
    * pruning forgone for that batch). */
  def probe(batchSets: DataFrame): DataFrame = synchronized {
    val empty = batchSets
      .select(col("__id").as("new_id"), col("__id").as("base_id"),
        lit(0.0).as("jaccard"))
      .filter(lit(false))
    lastProbePushedKeys = false
    if (segments.isEmpty) return empty
    val b = graft.operators.Pin(withN(batchSets))
    val btok = b.select(Seq(col("__id"), col("__n"),
      explode(col("__ts")).as("__pe")) ++ blockCols.map(col): _*)
    val keyRows = btok.select("__pe").distinct()
      .limit(maxProbeKeys + 1).collect()
    if (keyRows.isEmpty) return empty
    val pushKeys = keyRows.length <= maxProbeKeys
    lastProbePushedKeys = pushKeys
    val keySeq = if (pushKeys) keyRows.map(_.getLong(0)).toSeq else Nil
    def keyed(df: DataFrame): DataFrame =
      if (pushKeys) df.where(col("__pe").isin(keySeq: _*)) else df
    // candidate pairs, one subplan per resident segment (≤ log₂ batches
    // of them — bounded plan width), all evaluated in ONE job
    val cands = segments.map { case (dir, _) =>
      // rank the batch's tokens under THIS segment's frozen order:
      // left join against the (token-pruned) vocab, unseen → f = 0
      // (rarest-first — consistent with the frozen base sort, which
      // contains only seen tokens, and maximally pruning)
      val vocab = keyed(spark.read.parquet(s"$dir/vocab"))
      val rankedB = btok.join(vocab, Seq("__pe"), "left")
        .withColumn("__f", coalesce(col("__f"), lit(0L)))
      val bpref = prefixRows(rankedB)
      val basePref = keyed(spark.read.parquet(s"$dir/pref"))
      val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
        .foldLeft(col("a.__pe") === col("b.__pe") &&
          least(col("a.__n"), col("b.__n")).cast("double") >=
            greatest(col("a.__n"), col("b.__n")) * lit(threshold))(_ && _)
      bpref.as("a").join(basePref.as("b"), joinCond)
        .select(col("a.__id").as("new_id"), col("b.__id").as("base_id"))
    }.reduce(_ unionByName _).distinct()
    // pin the (output-sized) candidate set: the verify attach below and
    // the bounded id collect both consume it
    val pinned = graft.operators.Pin(cands)
    val idRows = pinned.select("base_id").distinct()
      .limit(maxProbeKeys + 1).collect()
    if (idRows.isEmpty) return empty
    val baseSets0 = spark.read.parquet(segments.map(s => s"${s._1}/sets"): _*)
    val baseSets =
      if (idRows.length <= maxProbeKeys)
        baseSets0.where(col("__id").isin(idRows.map(_.get(0)).toSeq: _*))
      else baseSets0
    pinned
      .join(b.select(col("__id").as("new_id"), col("__ts").as("__ta")),
        "new_id")
      .join(baseSets.select(col("__id").as("base_id"),
        col("__ts").as("__tb")), "base_id")
      .withColumn("__inter",
        graft.functions.SortedIntersectCount(col("__ta"), col("__tb"))
          .cast("double"))
      .withColumn("jaccard", col("__inter") /
        (size(col("__ta")) + size(col("__tb")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("base_id"), col("jaccard"))
  }

  /** Resident segment count — ≤ log₂(batches)+1 under equal-sized adds. */
  def segmentCount: Int = synchronized(segments.length)

  /** Docs currently indexed. */
  def indexedDocs: Long = synchronized(segments.map(_._2).sum)

  /** Total doc rows ever written (adds + merge rewrites) — the
    * amortized O(docs · log batches) maintenance quantity. */
  def writtenDocsTotal: Long = synchronized(docsWrittenTotal)
}

object TextIngestIndex {
  /** Batch token hashes (and candidate base ids) collected to the
    * driver before the probe falls back from pushed-In scans to plain
    * joins. Text batches carry ~10² distinct tokens per doc, so this
    * sits higher than [[AnnIngestIndex.DefaultMaxProbeKeys]]; 100k long
    * literals is still a sub-MB predicate. */
  val DefaultMaxProbeKeys = 100000
}
