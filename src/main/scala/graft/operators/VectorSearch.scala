package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, same semantics:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    The dot/norm folds are built as explicit left-to-right double sums so
  *    the arithmetic is bit-reproducible across engines (the DuckDB oracle
  *    replays the same fold).
  *  - [[lshTopK]] — random-hyperplane LSH: bucket-join on sign signatures,
  *    exact rerank inside buckets. At fleet scale the bucket join replaces
  *    the O(queries × corpus) cross product; recall is set by the plane
  *    count and probe tables (validated against brute force in the spec).
  */
object VectorSearch {

  /** Explicit left-fold dot product of two `array<float>` columns in double
    * precision — deterministic summation order. */
  def dot(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double")
    }.reduce(_ + _)

  def norm2(a: Column, dim: Int): Column =
    (0 until dim).map { i =>
      val x = element_at(a, i + 1).cast("double")
      x * x
    }.reduce(_ + _)

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (sqrt(norm2(a, dim)) * sqrt(norm2(b, dim)))

  /** Exact top-k neighbors by cosine for each query vector (excluding self).
    * Broadcast the query side — it is small by construction. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv"), dim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic random hyperplanes (seeded), as literal arrays. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign signature of a vector against the planes, packed into a Long. */
  private def signature(vec: Column, ps: Seq[Array[Double]], dim: Int): Column =
    ps.zipWithIndex.map { case (p, j) =>
      val proj = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") * lit(p(i))
      }.reduce(_ + _)
      shiftleft(when(proj >= 0, 1L).otherwise(0L), j)
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Approximate top-k: candidates share an LSH bucket in ≥1 of
    * `numTables` independent sign-signature tables; exact cosine rerank on
    * the candidate set. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, planesPerTable: Int = 5,
      numTables: Int = 12, seed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, idName: String, vecName: String): DataFrame = {
      val cols = (0 until numTables).map { t =>
        val ps = planes(planesPerTable, dim, seed + t)
        struct(lit(t).as("table"), signature(col(vecName), ps, dim).as("key"))
      }
      df.withColumn("__b", explode(array(cols: _*)))
        .select(col(idName), col(vecName),
          col("__b.table").as("table"), col("__b.key").as("key"))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qb = bucketed(q, "query_id", "__qv")
    val cb = bucketed(c, "neighbor_id", "__cv")
    val cands = qb.as("q").join(cb.as("c"),
        col("q.table") === col("c.table") && col("q.key") === col("c.key") &&
          col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("q.query_id"), col("q.__qv"),
        col("c.neighbor_id"), col("c.__cv"))
      .distinct()
    val scored = cands.withColumn("cosine", cosine(col("__qv"), col("__cv"), dim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
