package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.{BufferedWriteLayer, GraftTable}

/** The MemBuffer tier (S4/W2): immediate read visibility of buffered
  * INSERTs, keep-greatest resolution against storage, and the flush
  * invariant — the resolved view is identical before and after flush.
  */
class BufferedWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(): GraftTable = {
    val dir = Files.createTempDirectory("graft_buf_").toString
    new GraftTable(spark, dir, TableSchemas.morVersioned)
  }

  private def rows(ids: Seq[Int], name: String) = {
    import spark.implicits._
    ids.toDF("n").select(
      (col("n") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, 0, n, 0)")).as("timestamp"),
      concat(lit("row-"), col("n")).as("id"),
      lit(name).as("name"))
  }

  private def t(m: Int) = Some(java.time.LocalDateTime.of(2024, 3, 2, 0, m))

  test("buffered inserts are readable before any commit; flush preserves the view") {
    val tbl = freshTable()
    tbl.append(rows(0 until 50, "stored"), t(0))
    val buf = new BufferedWriteLayer(tbl)

    buf.insert(rows(50 until 60, "buffered"), t(1))
    assert(tbl.currentVersion() == 1, "insert must not commit a version")
    assert(buf.readResolved().count() == 60, "buffered rows visible at once")
    assert(tbl.readResolved().count() == 50, "storage readers see storage only")

    // a buffered UPDATE of a stored identity wins by stamp
    buf.insert(rows(Seq(7), "updated"), t(2))
    val r7 = buf.readResolved().filter(col("id") === "row-7").collect()
    assert(r7.length == 1 && r7(0).getAs[String]("name") == "updated")

    // flush: view unchanged, rows durable, buffer empty
    val before = buf.readResolved().collect().toSet
    buf.flush()
    assert(buf.bufferedRows == 0L)
    assert(tbl.currentVersion() == 2, "flush commits ONE version for all batches")
    assert(tbl.readResolved().collect().toSet == before,
      "flush must not change the resolved view")
    // per-batch stamps survived the flush: the update still wins
    val r7b = tbl.readResolved().filter(col("id") === "row-7").collect()
    assert(r7b.length == 1 && r7b(0).getAs[String]("name") == "updated")
  }

  test("auto-flush at maxBufferedRows bounds the buffer") {
    val tbl = freshTable()
    val buf = new BufferedWriteLayer(tbl, maxBufferedRows = 15)
    buf.insert(rows(0 until 10, "a"), t(0))
    assert(tbl.currentVersion() == 0 && buf.bufferedRows == 10)
    buf.insert(rows(10 until 20, "b"), t(1)) // crosses the bound
    assert(tbl.currentVersion() == 1, "crossing the bound must flush")
    assert(buf.bufferedRows == 0L)
    assert(buf.readResolved().count() == 20)
  }
}
