package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.{ArrowIngest, BufferedWriteLayer, GraftTable}

/** S7 — Arrow-IPC ingest: IPC record batches round-trip through the
  * decode → conform → append path byte-exactly, via both the committed
  * and the buffered route.
  */
class ArrowIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rows(n: Int) = {
    import spark.implicits._
    spark.range(n).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, 0, id, 0)")).as("timestamp"),
      concat(lit("arrow-"), col("id")).as("id"),
      concat(lit("name-"), col("id") % 4).as("name"))
  }

  private def t0(m: Int) = Some(java.time.LocalDateTime.of(2024, 3, 2, 0, m))

  test("IPC batches decode distributed and append through the conforming path") {
    val dir = Files.createTempDirectory("graft_arrow_").toString
    val t = new GraftTable(spark, dir, TableSchemas.morVersioned)
    val src = rows(40)
    // multiple IPC record batches, as a streaming client would push them
    val batches = ArrowBridge.toBatchBytes(src, maxRecordsPerBatch = 16).toSeq
    assert(batches.size >= 3, s"expected several IPC batches, got ${batches.size}")

    ArrowIngest.ingest(t, src.schema, batches.iterator, t0(0))
    val resolved = t.readResolved()
    assert(resolved.count() == 40)
    // values survive the Arrow round trip exactly
    assert(resolved.select("project_id", "timestamp", "id", "name")
      .collect().toSet == src.collect().toSet)
  }

  test("buffered Arrow ingest is readable before any commit") {
    val dir = Files.createTempDirectory("graft_arrowbuf_").toString
    val t = new GraftTable(spark, dir, TableSchemas.morVersioned)
    val buf = new BufferedWriteLayer(t)
    val src = rows(10)
    ArrowIngest.ingestBuffered(buf, src.schema,
      ArrowBridge.toBatchBytes(src, 100), t0(0))
    assert(t.currentVersion() == 0, "buffered ingest must not commit")
    assert(buf.readResolved().count() == 10)
    buf.flush()
    assert(t.readResolved().count() == 10)
  }
}
