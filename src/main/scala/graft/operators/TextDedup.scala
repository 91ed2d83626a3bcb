package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash-groupBy), exact-Jaccard pair search, MinHash+LSH banding, and
  * SimHash with pigeonhole blocking.
  *
  * Scale design (100 TB): every operator is expressed as joins/aggregations
  * over blocking keys so candidate generation never materializes the O(n²)
  * pair space — LSH band buckets and SimHash chunks bound each join key's
  * fan-out; the exact-Jaccard verifier runs only on generated candidates.
  */
object TextDedup {

  /** Distinct lowercase whitespace tokens — the working set for all
    * set-similarity ops. */
  def tokenSet(text: Column): Column =
    array_distinct(split(lower(text), "\\s+"))

  /** Exact duplicate groups: one row per distinct content hash with the
    * keeper (min id) and the duplicate count. Hash-groupBy — one shuffle of
    * (hash, id), no pair space. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** All (a<b) same-block pairs with token-set Jaccard ≥ threshold.
    * `blockCols` bound the self-join (language, length bucket, LSH bucket…);
    * intersection/union are computed on the full token arrays so blocking
    * never changes a surviving pair's score. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    val toks = df.select(Seq(col(idCol).as("__id"),
      tokenSet(col(textCol)).as("__ts")) ++ blockCols.map(col): _*)
    val a = toks.as("a")
    val b = toks.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(col("a.__id") < col("b.__id"))(_ && _)
    a.join(b, blockCond)
      .withColumn("__inter",
        size(array_intersect(col("a.__ts"), col("b.__ts"))).cast("double"))
      .withColumn("jaccard", col("__inter") /
        (size(col("a.__ts")) + size(col("b.__ts")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("jaccard"))
  }

  /** MinHash signature: `numHashes` independent permutations of each token,
    * realized as `xxhash64(permIndex, tokenHash)` (re-hash with a distinct
    * seed column — no wraparound arithmetic, so it stays ANSI-safe and
    * codegen'd). */
  def minhashSignature(text: Column, numHashes: Int): Column = {
    val h = transform(tokenSet(text), t => xxhash64(t))
    val mins = (0 until numHashes).map { i =>
      array_min(transform(h, x => xxhash64(lit(i), x)))
    }
    array(mins: _*)
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `rowsPerBand`, bucket-join on (band index, band slice hash). Returns
    * distinct (id_a < id_b) candidates — verify with [[jaccardPairs]] logic
    * or [[verifiedMinhashPairs]]. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = df.select(col(idCol).as("__id"),
      minhashSignature(col(textCol), bands * rowsPerBand).as("__sig"))
    val banded = sigs.select(col("__id"),
      explode(array((0 until bands).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(slice(col("__sig"), bnd * rowsPerBand + 1, rowsPerBand)
            .cast("string")).as("key"))
      }: _*)).as("b"))
      .select(col("__id"), col("b.band"), col("b.key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()
  }

  /** MinHash+LSH with exact-Jaccard verification of the candidates: the
    * scalable near-dup operator (candidates from banding, score from the
    * true token sets — 100% precision, recall set by the band shape). */
  def verifiedMinhashPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, bands, rowsPerBand)
    val toks = df.select(col(idCol).as("__tid"), tokenSet(col(textCol)).as("__ts"))
    cands
      .join(toks.withColumnRenamed("__tid", "id_a").withColumnRenamed("__ts", "ts_a"), "id_a")
      .join(toks.withColumnRenamed("__tid", "id_b").withColumnRenamed("__ts", "ts_b"), "id_b")
      .withColumn("__inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("double"))
      .withColumn("jaccard", col("__inter") /
        (size(col("ts_a")) + size(col("ts_b")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over the token set: per bit, sum +1/−1 weighted by token
    * hash bits, take the sign. Expressed as one aggregate over exploded
    * tokens (64 conditional sums → bit reassembly). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol).as("__id"),
      explode(tokenSet(col(textCol))).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val agg = tokens.groupBy(col("__id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      shiftleft(when(col(s"__b$b") > 0, 1L).otherwise(0L), b)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("__id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Candidate
    * blocking by the pigeonhole principle: split the 64-bit hash into
    * `maxDist+1` chunks — any pair within distance shares ≥1 exact chunk, so
    * the join key space is chunks, never all pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val sigs = simhash(df, idCol, textCol)
    val banded = sigs.select(col("__id"), col("simhash"),
      explode(array((0 until chunks).map { i =>
        struct(lit(i).as("chunk"),
          shiftright(col("simhash"), i * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("c"))
      .select(col("__id"), col("simhash"), col("c.chunk"), col("c.key"))
    banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
