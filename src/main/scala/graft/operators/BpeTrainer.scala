package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training — the missing piece
  * between corpus curation and model training: given a cleaned corpus,
  * learn the merge table a BPE tokenizer ships with.
  *
  * Structure (and why it scales to 100 TB): the corpus is touched exactly
  * ONCE, by the word-frequency aggregation — one (word, count) shuffle,
  * the same shape as a vocabulary build. Every training iteration after
  * that operates on the VOCABULARY (millions of rows), not the corpus
  * (billions): pair counting explodes each distinct word's current
  * segmentation weighted by its frequency, one groupBy-sum picks the top
  * pair (a single-row collect — bounded driver metadata), and the merge
  * is applied vocabulary-wide with a codegen'd `aggregate` fold. k merges
  * = k vocab-sized shuffles after one corpus-sized one.
  *
  * Algorithm per the public BPE literature (Sennrich et al. 2016,
  * word-bounded merges, greedy leftmost application, ties broken by pair
  * text for determinism). */
object BpeTrainer {

  /** (word, freq) over lowercased whitespace-split text. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-pair counts over a segmentation frame
    * (word, freq, segs: array<string>), weighted by word frequency. */
  private def pairCounts(segmented: DataFrame): DataFrame =
    segmented.filter(size(col("segs")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(segs) - 1)," +
          " i -> struct(element_at(segs, i) AS left," +
          " element_at(segs, i + 1) AS right))")).as("pair"))
      .groupBy(col("pair.left").as("lhs"), col("pair.right").as("rhs"))
      .agg(sum(col("freq")).as("n"))

  /** Greedy leftmost application of one merge (a, b) → a||b to a symbol
    * array, as a codegen'd fold: "aaaa" under (a,a) becomes [aa, aa] —
    * the merged symbol never re-participates as the LEFT side within the
    * same pass, matching reference BPE implementations. */
  private def applyMerge(segs: Column, a: String, b: String): Column = {
    val (qa, qb) = (lit(a), lit(b))
    aggregate(segs, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === qa && x === qb,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(qa, qb))))
        .otherwise(concat(acc, array(x))))
  }

  /** One-scan pair statistics BEFORE any merge (symbols = characters):
    * the first training iteration's counts, exposed for oracle checks
    * and corpus profiling. */
  def initialPairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCounts(charSegmented(wordFrequencies(df, textCol)))

  /** Character array of a word. Spark's `split` keeps trailing empty
    * strings (limit = -1 semantics), and the not-at-start lookahead also
    * matches at end-of-string — strip the empties or every word grows a
    * phantom "" symbol that pairs with its last character. */
  private def chars(c: Column): Column =
    array_remove(split(c, "(?!^)"), "")

  private def charSegmented(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"), chars(col("word")).as("segs"))

  /** Learn `merges` merge rules. Returns the merge table
    * (rank, left, right, merged, freq) in learned order — the artifact a
    * BPE tokenizer loads. Stops early if no pair remains. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var segmented = Pin(charSegmented(wordFrequencies(df, textCol)))
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 0
    while (rank < merges) {
      // deterministic argmax: highest weighted count, ties by pair text
      val top = pairCounts(segmented)
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) rank = merges
      else {
        val r = top.head
        val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
        learned += ((learned.size + 1, a, b, a + b, n))
        val prev = segmented
        segmented = Pin(segmented.withColumn("segs",
          applyMerge(col("segs"), a, b)))
        // Pin is eager, so the previous iteration's vocab copy is no
        // longer needed — release it or k merges hold k cached vocabs
        prev.unpersist()
        rank += 1
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "merged", "freq")
  }

  /** Segment text with a learned merge table (the inference side):
    * char-split each word, apply merges in rank order, count resulting
    * tokens per doc — the "how many BPE tokens is this corpus" question
    * every training-budget plan starts with. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      mergeTable: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol), explode(split(lower(col(textCol)),
      "\\s+")).as("word")).filter(col("word") =!= "")
    val segs = mergeTable.foldLeft(chars(col("word"))) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }
    words.select(col(idCol), segs.as("segs"))
      .groupBy(idCol).agg(sum(size(col("segs"))).as("bpe_tokens"))
  }
}
