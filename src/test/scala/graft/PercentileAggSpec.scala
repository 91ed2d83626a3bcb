package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{F, PercentileAgg, TDigest}
import graft.functions.PercentileAgg.percentile_agg

/** Mirrors the reference's t-digest invariants
  * (/root/reference/src/functions.rs:1508-1526): bounded state, merge
  * preserves tail estimates — plus end-to-end distributed accuracy vs the
  * exact percentile.
  */
class PercentileAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("digest state is bounded regardless of input size") {
    val d = new TDigest(200)
    (0 until 100000).foreach(i => d.add(i.toDouble))
    assert(d.toBytes.length < 10000,
      s"state must not grow with input rows: ${d.toBytes.length}")
  }

  test("merge preserves tail estimate") {
    val left = new TDigest(200)
    val right = new TDigest(200)
    (0 until 50000).foreach(i => left.add(i.toDouble))
    (50000 until 100000).foreach(i => right.add(i.toDouble))
    left.merge(right)
    assert(left.toBytes.length < 10000)
    assert(math.abs(left.quantile(0.95) - 95000.0) < 1000.0)
  }

  test("serialization round-trips") {
    val d = new TDigest(200)
    (0 until 10000).foreach(i => d.add(math.sqrt(i.toDouble)))
    val d2 = TDigest.fromBytes(d.toBytes)
    assert(math.abs(d.quantile(0.5) - d2.quantile(0.5)) < 1e-9)
    assert(d2.min == d.min && d2.max == d.max)
  }

  test("distributed percentile_agg tracks exact percentile within 2%") {
    val df = spark.range(0, 100000, 1, 8)
      .select((col("id") % 9973).cast("double").as("v"))
    val got = df.agg(
      PercentileAgg.approx_percentile(0.5, percentile_agg(col("v"))).as("p50"),
      PercentileAgg.approx_percentile(0.95, percentile_agg(col("v"))).as("p95"),
      percentile(col("v"), lit(0.5)).as("e50"),
      percentile(col("v"), lit(0.95)).as("e95")).collect()(0)
    val (p50, p95) = (got.getDouble(0), got.getDouble(1))
    val (e50, e95) = (got.getDouble(2), got.getDouble(3))
    assert(math.abs(p50 - e50) / e50 < 0.02, s"p50 $p50 vs exact $e50")
    assert(math.abs(p95 - e95) / e95 < 0.02, s"p95 $p95 vs exact $e95")
  }

  test("SQL shape: approx_percentile(0.95, percentile_agg(x))") {
    F.registerAll(spark)
    spark.range(0, 1000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("pa_test")
    val r = spark.sql(
      "SELECT approx_percentile(0.95, percentile_agg(v)) AS p FROM pa_test")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 950.0) < 25.0)
  }

  test("q22 rank-error bound: every group's estimate ranks within 1% or " +
      "4 rows of its target percentile against the exact multiset") {
    // the driver gate's quantitative story for the one approximate
    // aggregate (the ANN-recall treatment): ε = |rank(estimate)/n − p|
    // measured over every (day, event_type) group at both shipped
    // percentiles; SampledRecall records the same number per scale dir
    // into the round artifact.
    val (eps, rows) = graft.SampledRecall.tdigestRankEps(spark,
      "/root/testdata/sf0.01")
    // gate-scale groups run ~100 rows, where rank granularity alone is a
    // row; the bound is therefore "within 1% OR within 4 ROWS of the
    // target rank" — at fleet group sizes the relative arm takes over
    assert(eps <= 0.01 || rows <= 4.0,
      f"t-digest rank error: eps=$eps%.5f rows=$rows%.1f")
  }

  test("empty input yields NULL digest and NULL percentile") {
    val r = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(PercentileAgg.approx_percentile(0.5, percentile_agg(col("v"))).as("p")).collect()(0)
    assert(r.isNullAt(0))
  }
}
