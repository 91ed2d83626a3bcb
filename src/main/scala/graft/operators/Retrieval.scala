package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval — the scoring counterpart of the boolean
  * `text_match` (reference `src/tantivy_index/udf.rs`: its FTS surface is
  * hit/no-hit; ranking is a Spark-first extension). Okapi BM25 with the
  * standard k1/b parameterization, statistics (document frequency, average
  * document length) trained on the corpus itself.
  *
  * Scale design: the only rows that ever shuffle are (doc, query-term)
  * hits — the per-token filter `isin(terms)` runs map-side against a tiny
  * literal set before the tf groupBy, so corpus volume never reaches an
  * exchange; df/avgdl are one map-side-combinable aggregation each,
  * broadcast back as 1-row/`|terms|`-row frames. Top-k lands on
  * `TakeOrderedAndProject` (per-partition heads + merge, no global sort).
  */
object Retrieval {

  /** BM25 top-`k` documents for a bag-of-words query: returns
    * `(idCol, n_terms_hit, score)` for the `k` best-scoring documents
    * containing at least one query term; `score` is rounded to 4 decimals
    * so ordering and the DuckDB oracle replay are float-stable. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val docs = df.select(col(idCol),
      TextAnalysis.wordArr(col(textCol)).as("__ws"))
    val lens = docs.select(col(idCol), size(col("__ws")).as("__dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    // per-(doc, term) frequency — the filter keeps only query-term tokens,
    // so the exploded stream thins to the hit volume before shuffling
    val tf = docs.select(col(idCol), explode(col("__ws")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__t").agg(count(lit(1)).cast("double").as("__df"))
    val scored = tf
      .join(broadcast(dfreq), "__t")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * col("__tf") * (k1 + 1) /
        (col("__tf") +
          (col("__dl") / col("__avgdl") * b + (1 - b)) * k1))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("__s")), 4).as("score"))
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
  }
}
