package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * perplexity quality filter: train bigram counts on the corpus itself,
  * then score each document by its mean per-bigram surprisal
  * `-log2 P(w2|w1)` with add-one smoothing,
  * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)`.
  * Templated/repetitive documents (high-count bigrams) score low;
  * gibberish (bigrams seen nowhere else) scores high — both tails are
  * what a pre-training pipeline trims.
  *
  * Scale design: two aggregation passes build the model (unigram and
  * bigram count tables — pure map-side-combinable groupBys), scoring is
  * two many-to-one equi-joins from the exploded document bigrams to those
  * tables plus one broadcast of the 1-row vocabulary count. No driver-side
  * data path, no pair space; the shuffles are the same shape as word-count.
  * Join keys stay as strings so results are oracle-exact — a production
  * deployment at 100 TB would key the count tables by `xxhash64(bigram)`
  * to shrink the shuffle (collision odds ~|V|²/2⁶⁵, the [[TextDedup]]
  * hashed-token-set argument).
  */
object LanguageModel {

  // tokenization is shared with the other order-sensitive text ops:
  // TextAnalysis.wordArr (trimmed lowercase split — padding never mints
  // empty-string tokens into the vocabulary) and TextAnalysis.wordNgrams
  // (ordered space-joined n-grams with the bind-once lambda trick)

  /** Per-document mean bigram surprisal: `(idCol, n_bigrams, avg_nll)`.
    * Documents with fewer than two tokens have no bigrams and are absent
    * from the output (nothing to score). */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val uni = df.select(explode(TextAnalysis.wordArr(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("__v"))
    val bg = df.select(col(idCol),
      explode(TextAnalysis.wordNgrams(col(textCol), 2)).as("__bg"))
    val bgc = bg.groupBy("__bg").agg(count(lit(1)).as("__cb"))
    bg.join(bgc, "__bg")
      // tokens cannot contain whitespace (they came from a \s+ split), so
      // the first space-delimited field IS w1
      .withColumn("__w", substring_index(col("__bg"), " ", 1))
      .join(uni, "__w")
      .crossJoin(broadcast(vocab))
      .withColumn("__nll",
        -log2((col("__cb") + lit(1)) / (col("__cu") + col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
  }
}
