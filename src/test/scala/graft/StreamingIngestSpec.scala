package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.GraftTable
import graft.streaming.StreamingIngest

/** Streaming ingest + crash recovery — the Spark rendering of the
  * reference's kill_recovery / recover_from_wal behavior
  * (`/root/reference/tests/suite/`, `src/buffered_write_layer.rs:1256`):
  * a stream killed and restarted from its checkpoint loses nothing, and a
  * batch REPLAYED after a crash-before-checkpoint-commit converges to
  * exactly-once reads through the merge-on-read view.
  */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(from: Int, until: Int): DataFrame = {
    import spark.implicits._
    spark.range(from, until).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, 0, id, 0)")).as("timestamp"),
      concat(lit("ev-"), col("id")).as("id"),
      concat(lit("name-"), col("id") % 4).as("name"))
  }

  private def writeSourceFile(srcDir: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)

  private def startStream(table: GraftTable, srcDir: String,
      checkpoint: String) = {
    val source = spark.readStream
      .schema(rows(0, 1).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    StreamingIngest.start(table, source, checkpoint)
  }

  test("kill and restart from checkpoint: no loss, no duplication") {
    val tableDir = tmp("graft_stream_tbl_")
    val srcDir = tmp("graft_stream_src_")
    val ckpt = tmp("graft_stream_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)

    writeSourceFile(srcDir, rows(0, 50))
    val q1 = startStream(table, srcDir, ckpt)
    q1.processAllAvailable()
    q1.stop() // "kill" the ingest process
    assert(table.readResolved().count() == 50)

    // data arriving while the process is down
    writeSourceFile(srcDir, rows(50, 80))
    val q2 = startStream(table, srcDir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(table.readResolved().count() == 80, "restart must pick up new files only")
    assert(table.readResolved().filter(col("id") === "ev-0").count() == 1)
  }

  test("replayed batch (crash before checkpoint commit) converges to exactly-once") {
    val tableDir = tmp("graft_replay_tbl_")
    val srcDir = tmp("graft_replay_src_")
    val ckpt = tmp("graft_replay_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)

    writeSourceFile(srcDir, rows(0, 40))
    val q1 = startStream(table, srcDir, ckpt)
    q1.processAllAvailable()
    q1.stop()
    // snapshot the checkpoint BEFORE the next batch, then process it once…
    val ckptCopy = tmp("graft_replay_ckpt_copy_")
    copyDir(JPath.of(ckpt), JPath.of(ckptCopy))
    writeSourceFile(srcDir, rows(40, 60))
    val q2 = startStream(table, srcDir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(table.readResolved().count() == 60)
    val rawAfterFirst = table.readRaw().count()

    // …then restart from the STALE checkpoint: the sink re-appends the same
    // batch (at-least-once delivery), and the dedup view must absorb it.
    val q3 = startStream(table, srcDir, ckptCopy)
    q3.processAllAvailable()
    q3.stop()
    assert(table.readRaw().count() > rawAfterFirst,
      "replay should have appended duplicate versions")
    assert(table.readResolved().count() == 60,
      "resolved view must converge to exactly-once")
    assert(table.readResolved().groupBy("id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streamed and interactive writes interleave last-writer-wins (both directions)") {
    val tableDir = tmp("graft_mix_tbl_")
    val srcDir = tmp("graft_mix_src_")
    val ckpt = tmp("graft_mix_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)

    // stream writes rows with wall-clock stamps…
    writeSourceFile(srcDir, rows(0, 10))
    val q1 = startStream(table, srcDir, ckpt)
    q1.processAllAvailable()
    q1.stop()
    Thread.sleep(50)

    // …a later interactive UPDATE must win over the earlier streamed version
    table.update(col("id") === "ev-3", Map("name" -> lit("dml-wins")))
    assert(table.readResolved().filter(col("id") === "ev-3")
      .head().getAs[String]("name") == "dml-wins",
      "interactive DML after the stream must win the tiebreak")
    Thread.sleep(50)

    // …and a still-later streamed rewrite of the same identity must win back
    writeSourceFile(srcDir,
      rows(3, 4).withColumn("name", lit("stream-wins")))
    val q2 = startStream(table, srcDir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(table.readResolved().filter(col("id") === "ev-3")
      .head().getAs[String]("name") == "stream-wins",
      "a streamed update after interactive DML must win the tiebreak")
  }

  test("crash replay of the same checkpoint reuses the persisted batch stamp") {
    val tableDir = tmp("graft_stamp_tbl_")
    val srcDir = tmp("graft_stamp_src_")
    val ckpt = tmp("graft_stamp_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)
    writeSourceFile(srcDir, rows(0, 5))
    val q = startStream(table, srcDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val first = StreamingIngest.persistedStamp(table, ckpt, 0L)
    Thread.sleep(20)
    // a replay of batch 0 reads the recorded stamp, not a fresh clock value
    assert(StreamingIngest.persistedStamp(table, ckpt, 0L) == first,
      "replayed batch must reuse its recorded stamp byte-for-byte")
    // and the recorded stamp equals what the appended rows carry
    val stamped = table.readRaw()
      .select(col("updated_at").cast("string")).distinct().head().getString(0)
    assert(stamped.replace(" ", "T").startsWith(
      first.toString.take(19)), s"rows carry $stamped, stamp log says $first")
  }

  test("sweepEvery folds streamed fragmentation into partial bases mid-stream") {
    val tableDir = tmp("graft_sweep_tbl_")
    val srcDir = tmp("graft_sweep_src_")
    val ckpt = tmp("graft_sweep_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)
    table.append(rows(0, 30), Some(java.time.LocalDateTime.of(2024, 3, 1, 12, 0)))
    table.compact()
    // four single-file micro-batches re-writing the same identities
    (0 until 4).foreach(i => writeSourceFile(srcDir, rows(0, 10)
      .withColumn("name", lit(s"s$i"))))
    val source = spark.readStream.schema(rows(0, 1).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingIngest.start(table, source, ckpt, sweepEvery = 2)
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination(10000L) }
    // the sweep ran mid-stream: at least one partial base exists, and the
    // resolved view is the last stream batch's content
    val resolved = table.readResolved()
    assert(resolved.count() == 30)
    assert(resolved.filter(col("id") === "ev-3").head().getAs[String]("name")
      == "s3", "last streamed write wins")
    val markers = new java.io.File(
      s"$tableDir/${table.meta.name}/_commits").list().toSeq
    assert(markers.exists(_.contains(".pb.")),
      s"sweep must have committed a partial base, markers: $markers")
  }

  test("hot-tier demotion rides the flush and self-suppresses under churn") {
    val tableDir = tmp("graft_hotst_tbl_")
    val srcDir = tmp("graft_hotst_src_")
    val ckpt = tmp("graft_hotst_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)
    val H = 3600L * 1000000
    val tier = new graft.sources.HotTier(table, retentionMicros = 24 * H)
    // noon of the data's own day: the rows (00:00–00:09) stay inside the
    // 24 h retention window even after the cooldown advance below
    graft.functions.GraftClock.set(
      java.time.LocalDateTime.of(2024, 3, 1, 12, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
    try {
      // six single-file micro-batches re-writing the same identities: every
      // demoted slice dies before any query reads it — pure churn
      (0 until 6).foreach(i => writeSourceFile(srcDir, rows(0, 10)
        .withColumn("name", lit(s"s$i"))))
      val source = spark.readStream.schema(rows(0, 1).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      // explicit increasing stamps: the frozen clock (needed for the tier's
      // cutoff/cooldown arithmetic) would otherwise mint six EQUAL batch
      // stamps and break last-writer-wins
      val q = StreamingIngest.start(table, source, ckpt,
        stamp = Some(bid => java.time.LocalDateTime.of(2024, 3, 1, 13, bid.toInt)),
        hotTier = Some(tier))
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination(10000L) }
      val s = tier.stats
      assert(s("builds") >= 4 && s("suppressions") >= 1,
        s"churn must convict the table: $s")
      assert(s("wasted_builds") >= 4)
      // reads stay correct while suppressed (cold fallback)
      val r = tier.read(Some(24 * H))
      assert(r.count() == 10)
      assert(r.filter(col("id") === "ev-3").head().getAs[String]("name") == "s5",
        "last streamed write wins through the tier's cold fallback")
      // churn stops + cooldown lifts → a single re-probe build serves hot
      graft.functions.GraftClock.advance(31 * 60 * 1000000L)
      assert(tier.demote())
      assert(tier.read(Some(24 * H)).count() == 10)
      assert(tier.stats("hot_served") >= 1)
    } finally {
      graft.functions.GraftClock.reset()
      tier.release()
    }
  }

  test("in-batch dedup keeps one deterministic winner per identity") {
    import spark.implicits._
    val dup = rows(0, 10).union(rows(0, 10)
      .withColumn("name", lit("zzz-wins-lexicographically")))
    val deduped = StreamingIngest.dedupBatch(dup, Seq("timestamp", "id"))
    assert(deduped.count() == 10)
    assert(deduped.filter(col("name") === "zzz-wins-lexicographically").count() == 10)
  }

  private def copyDir(src: JPath, dst: JPath): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(src).iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  test("coalescer drains aged deferred updates on the batch cadence") {
    import spark.implicits._
    val tableDir = tmp("graft_coal_tbl_")
    val srcDir = tmp("graft_coal_src_")
    val ckpt = tmp("graft_coal_ckpt_")
    val table = new GraftTable(spark, tableDir, TableSchemas.morVersioned)
    val c = new graft.sources.DmlCoalescer(
      autoDrainAfter = Int.MaxValue, maxAgeMillis = 0)

    writeSourceFile(srcDir, rows(0, 20))
    val source = spark.readStream
      .schema(rows(0, 1).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = StreamingIngest.start(table, source, ckpt, coalescer = Some(c))
    q.processAllAvailable()
    // defer an update while the stream runs; age 0 => due immediately,
    // so the NEXT batch's ride-along drain applies it
    c.enqueue(table, Seq(("ev-3", "patched")).toDF("id", "new_name"),
      Seq("id"), Map("name" -> org.apache.spark.sql.functions.col("s.new_name")))
    writeSourceFile(srcDir, rows(20, 30))
    q.processAllAvailable()
    q.stop()
    assert(c.pendingStatements == 0, "ride-along drain must have fired")
    val got = table.readResolved().filter(col("id") === "ev-3")
      .select("name").head().getString(0)
    assert(got == "patched")
    assert(table.readResolved().count() == 30)
  }

}
