package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GuardedTables, ProjectIdGuard}
import graft.schema.TableSchemas
import graft.sources.{GraftStats, GraftTable}

/** S8 introspection table + the join-condition tenant-guard extension. */
class GraftStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("graft_stats view exposes session and table state") {
    val t = new GraftTable(spark,
      Files.createTempDirectory("graft_stats_").toString, TableSchemas.morVersioned)
    import spark.implicits._
    t.append(spark.range(3).select(
      lit("1").as("project_id"),
      lit("2024-03-01 00:00:00").cast("timestamp_ntz").as("timestamp"),
      concat(lit("r"), col("id")).as("id"),
      lit("n").as("name")),
      Some(java.time.LocalDateTime.of(2024, 3, 2, 0, 0)))
    GraftStats.register(spark, Seq(t))
    val rows = spark.sql(
      "SELECT key, value FROM graft_stats WHERE component = 'mor_versioned'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("current_version") == "1")
    assert(rows("compact_snapshot") == "false")
    assert(rows("dedup_keys") == "timestamp,id")
    val session = spark.sql(
      "SELECT value FROM graft_stats WHERE component='session' AND key='spark_version'")
      .collect()
    assert(session.nonEmpty && session(0).getString(0).nonEmpty)
  }

  test("graft_stats exposes hot-tier payoff and scan-gate pressure rows") {
    val t = new GraftTable(spark,
      Files.createTempDirectory("graft_stats_").toString, TableSchemas.morVersioned)
    t.append(spark.range(3).select(
      lit("1").as("project_id"),
      lit("2024-03-01 00:00:00").cast("timestamp_ntz").as("timestamp"),
      concat(lit("r"), col("id")).as("id"),
      lit("n").as("name")),
      Some(java.time.LocalDateTime.of(2024, 3, 2, 0, 0)))
    val tier = new graft.sources.HotTier(t, retentionMicros = 1L)
    val gate = new graft.sources.ScanGate()
    gate.run(spark, wide = true)(())
    GraftStats.register(spark, Seq(t), Seq(tier), Seq(gate))
    // tier rows key by name@root (same-named tables at different paths
    // must not collide); gate rows by the gate's stable label
    val tierRows = spark.sql(
      s"SELECT key, value FROM graft_stats WHERE component = 'hot_tier.mor_versioned@${t.root}'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tierRows("builds") == "0" && tierRows.contains("wasted_builds"))
    val gateRows = spark.sql(
      "SELECT key, value FROM graft_stats WHERE component = 'scan_gate.graft_wide'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gateRows("gated") == "1")
    val buf = new graft.sources.BufferedWriteLayer(t, durable = true)
    buf.insert(spark.range(2).select(
      lit("1").as("project_id"),
      lit("2024-03-01 01:00:00").cast("timestamp_ntz").as("timestamp"),
      concat(lit("b"), col("id")).as("id"),
      lit("n").as("name")),
      Some(java.time.LocalDateTime.of(2024, 3, 2, 1, 0)))
    GraftStats.register(spark, Seq(t), Seq(tier), Seq(gate), Seq(buf))
    val bufRows = spark.sql(
      s"SELECT key, value FROM graft_stats WHERE component = 'buffer.mor_versioned@${t.root}'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bufRows("buffered_rows") == "2" && bufRows("durable") == "true")
  }

  test("tenant guard accepts project_id carried in a join condition") {
    val t = new GraftTable(spark,
      Files.createTempDirectory("graft_guard_join_").toString,
      TableSchemas.morVersioned)
    import spark.implicits._
    t.append(spark.range(5).select(
      (col("id") % 2).cast("string").as("project_id"),
      lit("2024-03-01 00:00:00").cast("timestamp_ntz").as("timestamp"),
      concat(lit("r"), col("id")).as("id"),
      lit("n").as("name")),
      Some(java.time.LocalDateTime.of(2024, 3, 2, 0, 0)))
    val path = s"${t.root}/${t.meta.name}"
    GuardedTables.guard(path)
    try {
      val src = Seq(("r1", "x")).toDF("sid", "v")
      val joined = t.readRaw().alias("t").join(src.alias("s"),
        col("t.id") === col("s.sid") && col("t.project_id") === "1")
      ProjectIdGuard(joined.queryExecution.analyzed) // must not throw
    } finally GuardedTables.unguard(path)
  }
}
