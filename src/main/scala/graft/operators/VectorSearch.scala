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

  /** Sign signature of a vector against a plane matrix carried as ONE
    * `typedlit(array<array<double>>)` literal: each projection is a
    * `zip_with`+`aggregate` left fold (same summation order as the explicit
    * fold, so signatures are bit-identical), and the plan holds one Literal
    * node per table instead of planes×dim inlined multiply-adds — plan size
    * stays O(planes), not O(planes×dim). */
  private def signature(vec: Column, planesLit: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(vec, element_at(planesLit, j + 1),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      shiftleft(when(proj >= 0, 1L).otherwise(0L), j)
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Approximate top-k: candidates share an LSH bucket in ≥1 of
    * `numTables` independent sign-signature tables; exact cosine rerank on
    * the candidate set. The candidate dedup runs on (query_id, neighbor_id)
    * ONLY — vectors are re-joined afterwards, so the distinct never shuffles
    * or group-compares embedding payloads. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, planesPerTable: Int = 5,
      numTables: Int = 12, seed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, idName: String, vecName: String): DataFrame = {
      val cols = (0 until numTables).map { t =>
        val planesLit = typedLit(planes(planesPerTable, dim, seed + t).map(_.toSeq))
        struct(lit(t).as("table"),
          signature(col(vecName), planesLit, planesPerTable).as("key"))
      }
      df.withColumn("__b", explode(array(cols: _*)))
        .select(col(idName), col("__b.table").as("table"), col("__b.key").as("key"))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val cands = bucketed(q, "query_id", "__qv").as("q")
      .join(bucketed(c, "neighbor_id", "__cv").as("c"),
        col("q.table") === col("c.table") && col("q.key") === col("c.key") &&
          col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("q.query_id"), col("c.neighbor_id"))
      .distinct()
    val scored = cands
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv"), dim))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
