package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GuardedTables, MissingProjectIdException, ProjectIdGuard}
import graft.schema.TableSchemas
import graft.sources.GraftTable

/** Storage-engine semantics: version-append writes, keep-greatest resolution,
  * tombstones, compaction invariance, and the multi-tenant scan guard —
  * mirrors the reference's merge_on_read.slt + integration suite behaviors.
  */
class GraftTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(): GraftTable = {
    val dir = Files.createTempDirectory("graft_mor_").toString
    new GraftTable(spark, dir, TableSchemas.morVersioned)
  }

  private def sampleRows(n: Int) = {
    import spark.implicits._
    spark.range(n).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, 0, id, 0)")).as("timestamp"),
      concat(lit("row-"), col("id")).as("id"),
      concat(lit("name-"), col("id") % 4).as("name"))
  }

  private def t0(m: Int) = Some(java.time.LocalDateTime.of(2024, 3, 2, 0, m))

  test("append + resolve returns each identity once") {
    val t = freshTable()
    t.append(sampleRows(100), t0(0))
    assert(t.readResolved().count() == 100)
    // duplicate insert of same identities -> still 100 after resolve
    t.append(sampleRows(100), t0(1))
    assert(t.readRaw().count() == 200)
    assert(t.readResolved().count() == 100)
  }

  test("update is version-append and readers see last write") {
    val t = freshTable()
    t.append(sampleRows(50), t0(0))
    t.update(col("id") === "row-7", Map("name" -> lit("updated")), t0(5))
    val resolved = t.readResolved()
    assert(resolved.count() == 50)
    val row7 = resolved.filter(col("id") === "row-7").collect()
    assert(row7.length == 1 && row7(0).getAs[String]("name") == "updated")
    // physical rows grew by exactly the touched row
    assert(t.readRaw().count() == 51)
  }

  test("delete appends a tombstone; identity disappears from resolved view") {
    val t = freshTable()
    t.append(sampleRows(50), t0(0))
    t.delete(col("name") === "name-2", t0(5))
    val resolved = t.readResolved()
    assert(resolved.filter(col("name") === "name-2").count() == 0)
    assert(resolved.count() == 50 - 12) // name-2 ⇔ id%4==2 ⇔ ids 2,6,…,46 (12 rows)
  }

  test("compaction preserves the resolved view and collapses versions") {
    val t = freshTable()
    t.append(sampleRows(80), t0(0))
    t.update(col("id") === "row-3", Map("name" -> lit("u1")), t0(1))
    t.update(col("id") === "row-3", Map("name" -> lit("u2")), t0(2))
    t.delete(col("id") === "row-9", t0(3))
    val before = t.readResolved().orderBy("id").collect()
    val physicalBefore = t.readRaw().count()
    t.compact()
    val after = t.readResolved().orderBy("id").collect()
    assert(before.map(_.getAs[String]("id")).toSeq ==
      after.map(_.getAs[String]("id")).toSeq)
    assert(after.filter(_.getAs[String]("id") == "row-3")
      .head.getAs[String]("name") == "u2")
    assert(t.readRaw().count() < physicalBefore,
      "compaction must collapse versions")
    assert(t.readRaw().count() == after.length)
  }

  test("partition layout is (project_id, date)") {
    val t = freshTable()
    t.append(sampleRows(30), t0(0))
    val dirs = new java.io.File(s"${t.root}/${t.meta.name}").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("project_id=0", "project_id=1", "project_id=2")),
      dirs.mkString(","))
  }

  test("project-id guard rejects unfiltered scans of guarded roots") {
    val t = freshTable()
    t.append(sampleRows(10), t0(0))
    val path = s"${t.root}/${t.meta.name}"
    GuardedTables.guard(path)
    try {
      val unfiltered = spark.read.parquet(path).groupBy("name").count()
      intercept[MissingProjectIdException] {
        ProjectIdGuard(unfiltered.queryExecution.analyzed)
      }
      val filtered = spark.read.parquet(path)
        .filter(col("project_id") === "1").groupBy("name").count()
      ProjectIdGuard(filtered.queryExecution.analyzed) // must not throw
      val inList = spark.read.parquet(path)
        .filter(col("project_id").isin("1", "2")).select("id")
      ProjectIdGuard(inList.queryExecution.analyzed) // must not throw
    } finally GuardedTables.unguard(path)
  }
}
