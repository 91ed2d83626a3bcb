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

  /** Per-(doc, query-term) BM25 contributions — the shared kernel of the
    * single-query ranker and the multi-query evaluator. */
  private def bm25TermScores(p: Prep, idCol: String, k1: Double,
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
  }

  private def bm25Scores(p: Prep, idCol: String, k1: Double,
      b: Double): DataFrame =
    bm25TermScores(p, idCol, k1, b)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("__s")), 4).as("score"))

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

  /** Retrieval-quality evaluation at corpus scale: BM25-rank a BATCH of
    * bag-of-words queries in one tokenization pass, grade relevance as
    * the count of distinct query terms a document contains (graded
    * qrels derived deterministically from the corpus itself — the
    * standard proxy when no human judgments exist), and report
    * recall@k / DCG@k / nDCG@k per query.
    *
    * Scale design: the queries frame is a broadcast literal; per-term
    * scores are computed ONCE over the union of all queries' terms and
    * fan out to queries through the broadcast join, so q queries cost
    * one corpus pass, not q. Ranks come from one window partitioned by
    * query (state per query = its candidate set, not the corpus). The
    * DCG sums route each term through round-then-DECIMAL so Spark and a
    * SQL replay agree bit-for-bit regardless of summation order.
    *
    * Returns one row per query:
    * `(query_id, n_rel, hits_at_k, recall_at_k, dcg_at_k, ndcg_at_k)`. */
  def bm25Evaluate(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "bm25Evaluate needs at least one query")
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qt = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(q -> _) }
        .toDF("query_id", "__t"))
    val per = bm25TermScores(
      prep(df, idCol, textCol, allTerms), idCol, k1, b)
    // per (query, doc): score over the query's own terms; grade = how
    // many of them the doc contains (graded relevance, 1..|terms|)
    val scored = per.join(qt, "__t")
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"),
        count(lit(1)).as("grade"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    val byGrade = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col(idCol).asc)
    val ranked = scored
      .withColumn("rnk", row_number().over(byScore))
      .withColumn("irnk", row_number().over(byGrade))
    val d = org.apache.spark.sql.types.DecimalType(30, 12)
    def gain(rank: org.apache.spark.sql.Column) =
      round(col("grade").cast("double") / log(2.0, rank + 1), 8).cast(d)
    val metrics = ranked.groupBy("query_id")
      .agg(
        count(lit(1)).as("__nr"),
        sum(when(col("rnk") <= k, 1L).otherwise(0L)).as("__hits"),
        sum(when(col("rnk") <= k, gain(col("rnk"))).otherwise(lit(0).cast(d)))
          .cast("double").as("__dcg"),
        sum(when(col("irnk") <= k, gain(col("irnk"))).otherwise(lit(0).cast(d)))
          .cast("double").as("__idcg"))
    // a query whose terms hit NOTHING is a result, not an absent row:
    // counters zero, ratio metrics null (0/0 has no value)
    val qids = broadcast(queries.map(_._1).distinct.toDF("query_id"))
    qids.join(metrics, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__nr"), lit(0L)).as("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        round(col("__hits").cast("double") / col("__nr"), 6)
          .as("recall_at_k"),
        round(col("__dcg"), 6).as("dcg_at_k"),
        round(col("__dcg") / col("__idcg"), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }

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
