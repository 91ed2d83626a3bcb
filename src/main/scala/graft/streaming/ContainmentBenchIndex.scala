package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frozen benchmark-side index for STREAMING containment
  * decontamination (q137) — the [[TextIngestIndex]] discipline applied
  * to the asymmetric probe (VERDICT r12 stretch #7): the benchmark
  * suite is pinned and small, the training corpus ARRIVES in
  * micro-batches, and before this index every batch re-tokenized the
  * bench, re-counted its document frequencies, and re-built its rarity
  * prefix — O(bench) recompute per batch forever. Here the bench side
  * is tokenized, ranked, and prefix-cut ONCE into key-sorted parquet
  * (SegmentWriter: bloom on the sort key), and each batch probes it
  * through pushed token filters, so per-batch bench IO follows the
  * BATCH's token overlap, not the bench size.
  *
  * Exactness under the frozen order: the containment prefix filter —
  * if C(b,d) ≥ τ then among ANY ⌊(1−τ)·|T_b|⌋+1 tokens of b at least
  * one occurs in d — is lossless under ANY total order BOTH sides
  * share ([[graft.operators.TextDedup.containmentJoin]] ranks by
  * GLOBAL bench∪batch frequency only to minimize candidates). This
  * index freezes (bench document frequency, token hash) as the shared
  * order: batch tokens the bench never saw take f = 0 (they cannot
  * match a bench token anyway), and the PPJoin position filter carries
  * because both sides' positions are computed under the same frozen
  * order. The exact verify keeps only true matches either way, so the
  * q137/q135 oracle output is untouched.
  *
  * Layout under `root/` (one logical segment — the bench is pinned,
  * so there is no LSM lifecycle):
  *  - `vocab/`: `(__pe, __f)` frozen bench document frequencies,
  *    sorted by token hash — read through `__pe IN (batch tokens)` to
  *    rank the batch's tokens: batch-sized IO.
  *  - `pref/`: `(__pe, __bid, __bn, __bp0)` bench prefix rows WITH
  *    their frozen-order positions, sorted by `__pe` — the probe reads
  *    only prefix rows whose token occurs in the batch.
  *  - `sets/`: `(__bid, __bn, __bts)` full bench token sets sorted by
  *    id, read through a pushed id filter on the (output-sized)
  *    candidate bench ids for the exact verify. */
final class ContainmentBenchIndex(spark: org.apache.spark.sql.SparkSession,
    root: String, tau: Double,
    maxProbeKeys: Int = -1) extends IndexProbePlumbing {
  require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")

  private val keyBound =
    if (maxProbeKeys > 0) maxProbeKeys
    else graft.Autotune.ingestIndexMaxProbeKeys(100000,
      spark.conf.getOption("spark.graft.ingestIndex.maxProbeKeys"))

  private var built = false

  /** Freeze the bench side. `benchSets` carries `(__id, __ts)` — the
    * [[graft.operators.TextDedup.hashedSets]] shape (blocking columns
    * are not part of the containment contract). Idempotent overwrite. */
  def build(benchSets: DataFrame): Unit = synchronized {
    val b = graft.operators.Pin(benchSets
      .filter(size(col("__ts")) > 0)
      .select(col("__id").as("__bid"), col("__ts").as("__bts"),
        size(col("__ts")).as("__bn")))
    val n = math.max(b.count(), 1L)
    val btok = b.select(col("__bid"), col("__bn"),
      explode(col("__bts")).as("__pe"))
    val freq = btok.groupBy("__pe").agg(count(lit(1)).as("__f"))
    SegmentWriter.writeSorted(freq, s"$root/vocab", n * 64, "__pe")
    val vocab = spark.read.parquet(s"$root/vocab")
    // prefix width ⌊(1−τ)·|T_b|⌋+1 under the frozen (f, hash) order,
    // each row carrying its 0-based position for the PPJoin bound
    val pref = btok.join(vocab, "__pe")
      .groupBy("__bid").agg(first(col("__bn")).as("__bn"),
        array_sort(collect_list(struct(col("__f"), col("__pe"))))
          .as("__ord"))
      .select(col("__bid"), col("__bn"),
        posexplode(slice(col("__ord.__pe"), lit(1),
          (floor(col("__bn") * lit(1.0 - tau)) + 1).cast("int")))
          .as(Seq("__bp0", "__pe")))
    SegmentWriter.writeSorted(pref, s"$root/pref", n * 8, "__pe")
    SegmentWriter.writeSorted(b, s"$root/sets", n, "__bid")
    built = true
  }

  /** Containment matches between the frozen bench and one corpus
    * micro-batch: `(bench_id, doc_id, containment)` with
    * C(bench, doc) ≥ τ — exactly
    * [[graft.operators.TextDedup.containmentJoin]]'s contract
    * (spec-pinned equal, scores included). `batchSets` carries
    * `(__id, __ts)`. Bench IO is read through pushed batch-token /
    * candidate-id filters; above [[keyBound]] distinct batch tokens the
    * scans run unfiltered and the joins filter (correctness identical). */
  def probe(batchSets: DataFrame): DataFrame = synchronized {
    require(built, "build(benchSets) must run before probe")
    val empty = batchSets
      .select(col("__id").as("bench_id"), col("__id").as("doc_id"),
        lit(0.0).as("containment"))
      .filter(lit(false))
    lastProbePushedKeys = false
    val d = graft.operators.Pin(batchSets
      .filter(size(col("__ts")) > 0)
      .select(col("__id"), col("__ts"), size(col("__ts")).as("__n")))
    val dtok = d.select(col("__id"), col("__n"),
      explode(col("__ts")).as("__pe"))
    val keyRows = collectBounded(dtok, "__pe", keyBound)
    if (keyRows.isEmpty) return empty
    val pushKeys = keyRows.length <= keyBound
    recordProbePath(pushKeys)
    val keySeq = if (pushKeys) keyRows.map(_.getLong(0)).toSeq else Nil
    def keyed(df: DataFrame): DataFrame =
      if (pushKeys) df.where(col("__pe").isin(keySeq: _*)) else df
    // rank the batch's tokens under the FROZEN bench order (unseen →
    // f = 0; such tokens cannot match bench tokens, so their rank only
    // positions the rest consistently) and carry each token's 0-based
    // position in its doc's frozen-order sort for the position filter
    val vocab = keyed(spark.read.parquet(s"$root/vocab"))
    val postings = dtok.join(vocab, Seq("__pe"), "left")
      .withColumn("__f", coalesce(col("__f"), lit(0L)))
      .groupBy("__id").agg(first(col("__n")).as("__cn"),
        array_sort(collect_list(struct(col("__f"), col("__pe"))))
          .as("__ord"))
      .select(col("__id").as("__cid"), col("__cn"),
        posexplode(col("__ord.__pe")).as(Seq("__cp0", "__pe")))
    val pref = keyed(spark.read.parquet(s"$root/pref"))
    // the containmentJoin candidate conditions verbatim, under the
    // frozen shared order: size bound |T_d| ≥ τ·|T_b| and the PPJoin
    // position bound overlap ≤ 1 + min(n_b − p_b, n_d − p_d)
    val cands = pref.as("a").join(postings.as("b"),
        col("a.__pe") === col("b.__pe") &&
          col("b.__cn").cast("double") >= col("a.__bn") * lit(tau) &&
          (lit(1) + least(col("a.__bn") - (col("a.__bp0") + 1),
            col("b.__cn") - (col("b.__cp0") + 1))).cast("double") >=
            col("a.__bn") * lit(tau))
      .select(col("a.__bid").as("bench_id"), col("b.__cid").as("doc_id"))
      .distinct()
    val pinned = graft.operators.Pin(cands)
    val idRows = collectBounded(pinned, "bench_id", keyBound)
    if (idRows.isEmpty) return empty
    val sets0 = spark.read.parquet(s"$root/sets")
    val benchSets =
      if (idRows.length <= keyBound)
        sets0.where(col("__bid").isin(idRows.map(_.get(0)).toSeq: _*))
      else sets0
    pinned
      .join(benchSets.select(col("__bid").as("bench_id"),
        col("__bts").as("__ta"), col("__bn")), "bench_id")
      .join(d.select(col("__id").as("doc_id"), col("__ts").as("__tb")),
        "doc_id")
      .withColumn("containment",
        graft.functions.SortedIntersectCount(col("__ta"), col("__tb"))
          .cast("double") / col("__bn"))
      .filter(col("containment") >= tau)
      .select(col("bench_id"), col("doc_id"), col("containment"))
  }
}
