package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CountFastPath
import graft.schema.TableSchemas
import graft.sources.GraftTable

/** COUNT(*) footer fast path (reference `src/count_pushdown.rs` gates):
  * correct counts, footer-only interior files, scan only at window
  * boundaries, and a closed gate on un-compacted snapshots.
  */
class CountFastPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def t0(m: Int) = Some(java.time.LocalDateTime.of(2024, 4, 1, 0, m))

  private def freshTable() = new GraftTable(spark,
    Files.createTempDirectory("graft_cfp_").toString, TableSchemas.morVersioned)

  // 4 days × 24 rows/day for project 1 (hourly), same again for project 2
  private def rows = {
    import spark.implicits._
    spark.range(96).select(
      lit("1").as("project_id"),
      (lit("2024-03-01 00:30:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, id, 0, 0)")).as("timestamp"),
      concat(lit("a-"), col("id")).as("id"),
      lit("x").as("name"))
      .union(spark.range(96).select(
        lit("2").as("project_id"),
        (lit("2024-03-01 00:30:00").cast("timestamp_ntz")
          + expr("make_interval(0, 0, 0, 0, id, 0, 0)")).as("timestamp"),
        concat(lit("b-"), col("id")).as("id"),
        lit("x").as("name")))
  }

  test("gate: closed on an un-compacted snapshot, open after compact") {
    val t = freshTable()
    t.append(rows, t0(0))
    val lo = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 3, 5, 0, 0)
    assert(CountFastPath.countWindow(t, "1", lo, hi).isEmpty,
      "append-only version stack may hold duplicate identities")
    t.compact()
    assert(CountFastPath.countWindow(t, "1", lo, hi).isDefined)
  }

  test("interior days count from footers only; boundaries scan") {
    val t = freshTable()
    t.append(rows, t0(0))
    t.compact()
    // window [03-01 12:00, 03-04 06:00): day 2 and 3 fully inside,
    // days 1 and 4 partial
    val lo = java.time.LocalDateTime.of(2024, 3, 1, 12, 0)
    val hi = java.time.LocalDateTime.of(2024, 3, 4, 6, 0)
    val r = CountFastPath.countWindow(t, "1", lo, hi).get
    val expected = t.readResolved()
      .filter(col("project_id") === "1" &&
        col("timestamp") >= lit(lo.toString).cast("timestamp_ntz") &&
        col("timestamp") < lit(hi.toString).cast("timestamp_ntz"))
      .count()
    assert(r.count == expected, s"fast count ${r.count} != $expected")
    assert(r.footerOnlyFiles >= 2, "interior day files must count from footers")
    assert(r.scannedFiles <= 2, "only boundary files may be scanned")
  }

  test("unexpected partition directories don't crash the count") {
    val t = freshTable()
    t.append(rows, t0(0))
    t.compact()
    // a Hive default-partition dir (null event time) or any stray dir must
    // be tolerated, not crash LocalDate.parse
    val base = t.compactBaseDir().get
    val stray = new org.apache.hadoop.fs.Path(
      s"$base/project_id=1/date=__HIVE_DEFAULT_PARTITION__")
    stray.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(stray)
    val lo = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 3, 9, 0, 0)
    val r = CountFastPath.countWindow(t, "1", lo, hi).get
    assert(r.count == 96, s"count with stray partition dir: ${r.count}")
  }

  test("whole-table window is footer-only; missing tenant counts zero") {
    val t = freshTable()
    t.append(rows, t0(0))
    t.compact()
    val lo = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 3, 9, 0, 0)
    val r = CountFastPath.countWindow(t, "2", lo, hi).get
    assert(r.count == 96)
    assert(r.scannedFiles == 0, "fully-covered files must not be scanned")
    assert(CountFastPath.countWindow(t, "404", lo, hi).get.count == 0)
  }
}
