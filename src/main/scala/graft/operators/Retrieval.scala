package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval — the scoring counterpart of the boolean
  * `text_match` (reference `src/tantivy_index/udf.rs`: its FTS surface is
  * hit/no-hit; ranking is a Spark-first extension). Two scoring families
  * (Okapi BM25 and Dirichlet query-likelihood) over one shared
  * preparation, plus reciprocal-rank fusion for hybrid ranking.
  *
  * Scale design: the only rows that ever shuffle are (doc, query-term)
  * hits — the per-token filter `isin(terms)` runs map-side against a tiny
  * literal set before the tf groupBy, so corpus volume never reaches an
  * exchange; corpus statistics (document frequency, average/total length)
  * are map-side-combinable aggregations broadcast back as tiny frames.
  * Top-k lands on `TakeOrderedAndProject` (per-partition heads + merge,
  * no global sort).
  */
object Retrieval {

  /** Shared ranker inputs: per-doc lengths and per-(doc, query-term)
    * frequencies — ONE tokenization pass feeding every scorer, so the
    * hybrid query never re-scans the corpus per ranker. */
  private case class Prep(lens: DataFrame, tf: DataFrame)

  private def prep(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): Prep = {
    require(terms.nonEmpty, "retrieval needs at least one query term")
    val docs = df.select(col(idCol),
      TextAnalysis.wordArr(col(textCol)).as("__ws"))
    val lens = docs.select(col(idCol), size(col("__ws")).as("__dl"))
    // per-(doc, term) frequency — the filter keeps only query-term tokens,
    // so the exploded stream thins to the hit volume before shuffling
    val tf = docs.select(col(idCol), explode(col("__ws")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    Prep(lens, tf)
  }

  private def bm25Scores(p: Prep, idCol: String, k1: Double,
      b: Double): DataFrame = {
    val stats = p.lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val dfreq = p.tf.groupBy("__t")
      .agg(count(lit(1)).cast("double").as("__df"))
    p.tf
      .join(broadcast(dfreq), "__t")
      .join(p.lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * col("__tf") * (k1 + 1) /
        (col("__tf") +
          (col("__dl") / col("__avgdl") * b + (1 - b)) * k1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("__s")), 4).as("score"))
  }

  private def qlScores(p: Prep, idCol: String, mu: Double): DataFrame = {
    val total = p.lens.agg(sum(col("__dl")).cast("double").as("__ct"))
    // collection frequency per query term, folded over the small tf table
    // (absent terms have cf 0 = no smoothed mass and contribute nothing
    // to ordering; they simply never appear in the scoring set)
    val cf = p.tf.groupBy("__t").agg(sum(col("__tf")).cast("double").as("__cf"))
    // candidate docs × present query terms: every candidate scores every
    // term (smoothed background when tf=0), so the per-term sum is the
    // true query likelihood, not a hits-only partial
    val cands = p.tf.select(col(idCol)).distinct()
    cands
      .crossJoin(broadcast(cf))
      .join(p.tf, Seq(idCol, "__t"), "left")
      .join(p.lens, idCol)
      .crossJoin(broadcast(total))
      .withColumn("__s", log(
        (coalesce(col("__tf"), lit(0L)) + col("__cf") / col("__ct") * mu) /
          (col("__dl") + mu)))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
  }

  private def topK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)

  /** BM25 top-`k` documents for a bag-of-words query: returns
    * `(idCol, n_terms_hit, score)` for the `k` best-scoring documents
    * containing at least one query term; `score` is rounded to 4 decimals
    * so ordering and the DuckDB oracle replay are float-stable. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    topK(bm25Scores(prep(df, idCol, textCol, terms), idCol, k1, b), idCol, k)

  /** Dirichlet-smoothed query-likelihood top-`k` — the language-modeling
    * retrieval family (vs BM25's probabilistic-relevance family):
    * `score(d) = Σ_t ln((tf(t,d) + μ·P(t|C)) / (|d| + μ))` with the
    * collection model `P(t|C) = cf(t) / Σ cf`. Only documents containing
    * at least one query term are returned (same candidate semantics as
    * [[bm25TopK]]); absent terms still contribute their smoothed
    * background mass, so scores are comparable across documents. */
  def queryLikelihoodTopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, mu: Double = 300.0): DataFrame =
    topK(qlScores(prep(df, idCol, textCol, terms), idCol, mu), idCol, k)

  /** Reciprocal-rank fusion of two rankings (`1/(k0+rank)` summed where
    * the document appears; the standard hybrid-retrieval combiner for
    * e.g. lexical + semantic rankers). Each input must carry `idCol` and
    * a `score` column; ranks are assigned by `(score desc, id asc)` so
    * fusion is deterministic. Rankings are top-k lists (small) — the
    * fusion is a broadcast-scale outer join, never a corpus-scale op. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, name: String) = df.select(col(idCol),
      // long: SQL row_number() is BIGINT-shaped (DuckDB/PG emit int64)
      row_number().over(Window.orderBy(col("score").desc, col(idCol).asc))
        .cast("long").as(name))
    ranked(a, "rank_a").join(ranked(b, "rank_b"), Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (col("rank_a") + k0), lit(0.0)) +
          coalesce(lit(1.0) / (col("rank_b") + k0), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** Hybrid retrieval in one pass: BM25 and query-likelihood rankings
    * over the SAME [[prep]] (one corpus tokenization, one tf frame — the
    * two-independent-calls formulation pays the scan per ranker), fused
    * by [[rrfFuse]]. `kEach` bounds each ranker's list; `k` the fused
    * output. */
  def hybridTopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], kEach: Int, k: Int, k1: Double = 1.2,
      b: Double = 0.75, mu: Double = 300.0, k0: Int = 60): DataFrame = {
    val p = prep(df, idCol, textCol, terms)
    rrfFuse(topK(bm25Scores(p, idCol, k1, b), idCol, kEach),
      topK(qlScores(p, idCol, mu), idCol, kEach), idCol, k, k0)
  }
}
