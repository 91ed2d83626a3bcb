package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.GraftTable
import graft.streaming.StreamingAnalytics

/** Streaming analytics: watermarked windowed aggregation, the MOR-backed
  * continuous aggregate (late data corrects buckets through keep-greatest
  * versions), and flatMapGroupsWithState sessionization closing sessions on
  * both the new-batch and the event-time-timeout path.
  */
class StreamingAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def evs(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "t")
      .select(col("key"), col("t").cast("timestamp").as("ts"))
  }

  private def appendFile(dir: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  private def fileStream(dir: String): DataFrame =
    spark.readStream
      .schema(evs(Seq(("k", "2024-03-01 00:00:00"))).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  test("streaming bucket counts equal the batch groupBy on the same data") {
    val src = tmp("graft_bkt_src_")
    val data = Seq(
      ("a", "2024-03-01 10:00:05"), ("a", "2024-03-01 10:00:55"),
      ("a", "2024-03-01 10:01:10"), ("b", "2024-03-01 10:00:30"),
      ("b", "2024-03-01 10:02:59"))
    appendFile(src, evs(data))
    val q = StreamingAnalytics.bucketCounts(fileStream(src), "ts", "1 minute",
        "10 seconds", Seq("key"))
      .writeStream.format("memory").queryName("bkt")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("bkt").orderBy("key", "bucket_start")
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    val want = evs(data)
      .groupBy(col("key"),
        date_trunc("minute", col("ts")).cast("timestamp_ntz").as("bucket_start"))
      .agg(count(lit(1)).as("n"))
      .orderBy("key", "bucket_start")
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    assert(got.sameElements(want), s"${got.toSeq} vs ${want.toSeq}")
  }

  test("dedupStream drops cross-batch duplicates, keeps each id once") {
    val src = tmp("graft_dds_src_")
    // same ids in two separate files = two separate micro-batches; state
    // must survive the batch boundary for the duplicate to be dropped
    appendFile(src, evs(Seq(
      ("1", "2024-03-01 10:00:00"), ("2", "2024-03-01 10:01:00"),
      ("3", "2024-03-01 10:02:00"))))
    appendFile(src, evs(Seq(
      ("2", "2024-03-01 10:01:00"), ("3", "2024-03-01 10:02:00"),
      ("4", "2024-03-01 10:03:00"))))
    val q = StreamingAnalytics.dedupStream(fileStream(src), "ts", "1 hour",
        Seq("key"))
      .writeStream.format("memory").queryName("dds")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dds").collect()
      .map(r => r.getString(0)).sorted.toSeq
    assert(got == Seq("1", "2", "3", "4"), s"got $got")
  }

  test("continuous aggregate: late in-watermark data corrects buckets as new versions") {
    val src = tmp("graft_cagg_src_")
    val ckpt = tmp("graft_cagg_ckpt_")
    val table = new GraftTable(spark, tmp("graft_cagg_tbl_"),
      TableSchemas.bucketCounts)
    val stamp = (bid: Long) =>
      java.time.LocalDateTime.of(2024, 3, 2, 0, 0).plusMinutes(bid)
    val q = StreamingAnalytics.continuousAggregate(fileStream(src), table,
      "ts", "1 minute", "1 hour", "key", ckpt, stamp = Some(stamp))
    try {
      appendFile(src, evs(Seq(
        ("a", "2024-03-01 10:00:05"), ("a", "2024-03-01 10:00:20"),
        ("b", "2024-03-01 10:00:40"))))
      q.processAllAvailable()
      val r1 = table.readResolved().select("id", "n").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1 == Map("a" -> 2L, "b" -> 1L))

      // a LATE event for a's 10:00 bucket (inside the 1h watermark): update
      // mode re-emits the bucket, the append makes it a new version, and
      // keep-greatest resolves to the corrected count
      appendFile(src, evs(Seq(("a", "2024-03-01 10:00:50"))))
      q.processAllAvailable()
      val r2 = table.readResolved().select("id", "n").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == Map("a" -> 3L, "b" -> 1L),
        s"late data must correct the bucket in place: $r2")
      assert(table.readRaw().filter(col("id") === "a").count() == 2,
        "the correction must be a second VERSION of the bucket row")
    } finally q.stop()
  }

  test("streaming percentiles: exact equals batch; digest stays within error") {
    import spark.implicits._
    val src = tmp("graft_pct_src_")
    // two batches into the same bucket — the update-mode recompute must
    // fold both multisets (values chosen so p50 moves between batches)
    def vals(rows: Seq[(String, Double)]): DataFrame =
      rows.toDF("key", "value").select(col("key"),
        lit("2024-03-01 10:15:00").cast("timestamp").as("ts"), col("value"))
    appendFile(src, vals(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0))))
    appendFile(src, vals(Seq(("a", 10.0), ("a", 20.0))))
    val stream = spark.readStream
      .schema(vals(Seq(("a", 0.0))).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val out = tmp("graft_pct_out_")
    val q = StreamingAnalytics.bucketPercentiles(stream, "ts", "1 hour",
        "10 days", "key", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName("pct_exact")
      .option("checkpointLocation", out + "/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last update-mode emission carries the full multiset's percentiles:
    // sorted [1,2,3,10,20] → p50 = 3.0 (exact PG percentile_cont)
    val last = spark.sql(
      "SELECT p50, p95, n FROM pct_exact ORDER BY n DESC LIMIT 1").head
    assert(last.getLong(2) == 5L)
    assert(last.getDouble(0) == 3.0)
    assert(math.abs(last.getDouble(1) - 18.0) < 1e-9) // 10 + (20-10)*0.8

    // digest variant: bounded state, quantiles within digest error
    val q2 = StreamingAnalytics.digestPercentiles(stream, "ts", "1 hour",
        "10 days", "key", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName("pct_digest")
      .option("checkpointLocation", out + "/chk2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val dig = spark.table("pct_digest")
      .select(graft.functions.PercentileAgg.approx_percentile(0.5,
        col("digest")).as("p50"))
      .orderBy(col("p50").desc).head.getDouble(0)
    // 5 points, compression 100 → the digest holds them exactly;
    // its median definition may sit on either neighbor of the true one
    assert(dig >= 2.0 && dig <= 10.0, s"digest p50=$dig")
  }

  test("sessionize closes sessions via later batches and event-time timeout") {
    val src = tmp("graft_sess_src_")
    val q = StreamingAnalytics.sessionize(fileStream(src), "key", "ts",
        gapMillis = 60000L, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // b1: u1 has two events inside one gap; u2 one event
      appendFile(src, evs(Seq(
        ("u1", "2024-03-01 10:00:00"), ("u1", "2024-03-01 10:00:30"),
        ("u2", "2024-03-01 10:00:00"))))
      q.processAllAvailable()
      // b2: u1 starts a second session much later -> advances the watermark
      appendFile(src, evs(Seq(("u1", "2024-03-01 10:30:00"))))
      q.processAllAvailable()
      // b3: one more u1 event; during this batch the watermark (10:29:50)
      // closes u1's first session on the new-batch path and u2's only
      // session on the TIMEOUT path (u2 receives no events here)
      appendFile(src, evs(Seq(("u1", "2024-03-01 10:31:00"))))
      q.processAllAvailable()

      val got = spark.table("sess")
        .select("key", "session_start", "session_end", "n").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got.contains(
        ("u1", "2024-03-01 10:00:00.0", "2024-03-01 10:00:30.0", 2L)),
        s"u1's first session must close via the later-batch path: $got")
      assert(got.contains(
        ("u2", "2024-03-01 10:00:00.0", "2024-03-01 10:00:00.0", 1L)),
        s"u2's session must close via the event-time timeout: $got")
      assert(!got.exists(s => s._1 == "u1" && s._2.startsWith("2024-03-01 10:3")),
        "u1's second session is still open and must not be emitted")
    } finally q.stop()
  }

  test("ewmaStream drains incrementally across watermark advances, " +
      "out-of-order points fold in event-time order") {
    import spark.implicits._
    val src = tmp("graft_ewma_src_")
    def file(rows: Seq[(String, String, Long, Double)]): DataFrame =
      rows.toDF("key", "t", "id", "value")
        .select(col("key"), col("t").cast("timestamp").as("ts"),
          col("id"), col("value"))
    appendFile(src, file(Seq(("u1", "2024-03-01 10:00:00", 1L, 10.0))))
    val stream = spark.readStream
      .schema(file(Seq(("k", "2024-03-01 00:00:00", 0L, 0.0))).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingAnalytics.ewmaStream(stream, alpha = 0.25,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // b2 arrives OUT of event-time order (10:02 before 10:01) and far
      // enough ahead to move the watermark past both early points
      appendFile(src, file(Seq(
        ("u1", "2024-03-01 10:02:00", 3L, 30.0),
        ("u1", "2024-03-01 10:01:00", 2L, 20.0),
        ("u1", "2024-03-01 10:10:00", 9L, 90.0))))
      q.processAllAvailable()
      // b3: pure watermark advance via a sentinel key — u1's last point
      // drains on the TIMEOUT path without receiving any new events
      appendFile(src, file(Seq(("zz", "2024-03-01 11:00:00", 99L, 0.0))))
      q.processAllAvailable()
      appendFile(src, file(Seq(("zz", "2024-03-01 12:00:00", 98L, 0.0))))
      q.processAllAvailable()

      val snaps = spark.table("ewma").filter(col("key") === "u1")
        .select("n", "ewma").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      // drains happened incrementally: at least two distinct snapshots,
      // not one big final fold
      assert(snaps.length >= 2, s"expected incremental drains: ${snaps.toSeq}")
      // the fold order is event-time order despite arrival order:
      // s = 10 -> .25*20+.75*10 = 12.5 -> .25*30+.75*12.5 = 16.875
      //   -> .25*90+.75*16.875 = 35.15625
      assert(snaps.map(_._1).contains(3L) || snaps.map(_._1).contains(1L),
        s"an intermediate snapshot must exist: ${snaps.toSeq}")
      val fin = snaps.last
      assert(fin._1 == 4L, s"all four points must fold: ${snaps.toSeq}")
      assert(fin._2 == 35.15625, s"final level ${fin._2} != 35.15625")
    } finally q.stop()
  }

  test("streaming containment decontamination: per-batch union equals the " +
      "one-shot batch answer; a replayed micro-batch lands idempotently") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (1 to 30).map(i => s"w$i")
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    def run(c: DataFrame) = graft.operators.TextDedup
      .containmentJoin(bench, c, "doc_id", "text", tau = 0.6)
      .select("bench_id", "doc_id", "containment")
    val oneShot = run(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(oneShot.nonEmpty, "fixture must produce containment hits")
    val out = tmp("graft_contain_out_")
    (0 until 3).foreach { b =>
      run(corpus.filter(col("doc_id") % 3 === b))
        .write.mode("overwrite").parquet(s"$out/batch_$b")
    }
    // a re-delivered micro-batch (same batchId, same checkpointed input
    // files) overwrites its own directory — no duplicate emission
    run(corpus.filter(col("doc_id") % 3 === 1))
      .write.mode("overwrite").parquet(s"$out/batch_1")
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == oneShot)
  }

  test("randomized batching invariance: holtWinters/sequence streams equal " +
      "local reference folds under random micro-batch splits and shuffles") {
    // the bug class this hunts: a watermark boundary condition (<= vs <)
    // or a cross-drain carryover error shows up ONLY for some arrival
    // orders — random splits explore the space the hand-built scenarios
    // can't. Reference results are computed locally from the sorted
    // event-time order, which batching must never change.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 2).foreach { trial =>
      val keys = Seq("k1", "k2")
      val rows = (for {
        k <- keys
        h <- 0 until (20 + rnd.nextInt(20))
        if rnd.nextDouble() < 0.8
      } yield {
        val ts = s"2024-03-0${1 + h / 24} ${"%02d".format(h % 24)}:" +
          s"${"%02d".format(rnd.nextInt(60))}:00"
        (k, ts, (h * 7 + rnd.nextInt(5)).toLong,
          (rnd.nextInt(400) / 4.0), Seq("A", "B", "C")(rnd.nextInt(3)))
      }).distinct
      // random shuffle + random split into 2-5 files
      val shuffled = rnd.shuffle(rows)
      val cuts = 2 + rnd.nextInt(4)
      val chunks = shuffled.grouped(
        math.max(1, shuffled.size / cuts)).toSeq
      val srcHw = tmp(s"graft_rhw_${trial}_")
      val srcSeq = tmp(s"graft_rseq_${trial}_")
      def hwFile(rs: Seq[(String, String, Long, Double, String)]) =
        rs.map(r => (r._1, r._2, r._4)).toDF("key", "t", "value")
          .select(col("key"), col("t").cast("timestamp").as("ts"),
            col("value"))
      def seqFile(rs: Seq[(String, String, Long, Double, String)]) =
        rs.map(r => (r._1, r._2, r._3, r._5)).toDF("key", "t", "id", "etype")
          .select(col("key"), col("t").cast("timestamp").as("ts"),
            col("id"), col("etype"))
      chunks.foreach { ch =>
        appendFile(srcHw, hwFile(ch)); appendFile(srcSeq, seqFile(ch))
      }
      // two sentinel batches drain everything (far-future watermark)
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
        appendFile(srcHw, hwFile(Seq(("zz", t, 0L, 0.0, "A"))))
        appendFile(srcSeq, seqFile(Seq(("zz", t, 0L, 0.0, "A"))))
      }
      val hwStream = spark.readStream
        .schema(hwFile(Seq(("k", "2024-03-01 00:00:00", 0L, 0.0, "A"))).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcHw)
      // watermark longer than the event span: rows may arrive in ANY file
      // order without ever being late-dropped — what this spec tests is
      // that the fold still happens in event-time order, not arrival order
      val qh = StreamingAnalytics.holtWintersStream(hwStream, 0.5, 0.25,
          0.125, watermark = "5 days")
        .writeStream.format("memory").queryName(s"rhw$trial")
        .outputMode("append").start()
      val seqStream = spark.readStream
        .schema(seqFile(Seq(("k", "2024-03-01 00:00:00", 0L, 0.0, "A"))).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcSeq)
      val qs = StreamingAnalytics.sequenceStream(seqStream,
          watermark = "5 days")
        .writeStream.format("memory").queryName(s"rseq$trial")
        .outputMode("append").start()
      try { qh.processAllAvailable(); qs.processAllAvailable() }
      finally { qh.stop(); qs.stop() }

      // local reference: Holt-Winters over hourly 2-dp-decimal means in
      // hour order; trigrams over (ts, id) order
      keys.foreach { k =>
        val evs = rows.filter(_._1 == k)
        def epochMs(t: String): Long = java.time.LocalDateTime
          .parse(t.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        val byHour = evs.groupBy { r =>
          val t = epochMs(r._2)
          t - java.lang.Math.floorMod(t, 3600000L)
        }
        var l = 0.0; var b = 0.0; var n = 0L
        val seas = Array.fill(24)(0.0)
        byHour.toSeq.sortBy(_._1).foreach { case (hourMs, pts) =>
          val sum = pts.foldLeft(java.math.BigDecimal.ZERO) { (a, p) =>
            a.add(java.math.BigDecimal.valueOf(p._4)
              .setScale(2, java.math.RoundingMode.HALF_UP))
          }
          val xm = sum.doubleValue() / pts.size
          val slot = ((hourMs / 3600000L) % 24L).toInt
          val sPrev = seas(slot)
          val lNew = if (n == 0L) xm else 0.5 * (xm - sPrev) + 0.5 * (l + b)
          val bNew = if (n == 0L) 0.0 else 0.25 * (lNew - l) + 0.75 * b
          seas(slot) = 0.125 * (xm - lNew) + 0.875 * sPrev
          l = lNew; b = bNew; n += 1
        }
        val fin = spark.table(s"rhw$trial").filter(col("key") === k)
          .orderBy(col("n_hours").desc).select("n_hours", "l", "b")
          .collect().headOption
        assert(fin.exists(r => r.getLong(0) == n && r.getDouble(1) == l &&
          r.getDouble(2) == b),
          s"trial $trial key $k: stream $fin != local ($n, $l, $b)")

        val ordered = evs.sortBy(r => (epochMs(r._2), r._3)).map(_._5)
        val wantPaths = ordered.sliding(3).filter(_.size == 3)
          .map(_.mkString(" > ")).toSeq.sorted
        val gotPaths = spark.table(s"rseq$trial")
          .filter(col("key") === k).select("path")
          .collect().map(_.getString(0)).toSeq.sorted
        assert(gotPaths == wantPaths,
          s"trial $trial key $k: trigrams ${gotPaths.size} != " +
            s"local ${wantPaths.size}")
      }
    }
  }

  test("sequenceStream emits each consecutive trigram exactly once, " +
      "including across drain boundaries, in event-time order") {
    import spark.implicits._
    val src = tmp("graft_seq_src_")
    def file(rows: Seq[(String, String, Long, String)]): DataFrame =
      rows.toDF("key", "t", "id", "etype")
        .select(col("key"), col("t").cast("timestamp").as("ts"),
          col("id"), col("etype"))
    appendFile(src, file(Seq(("u1", "2024-03-01 10:00:00", 1L, "A"))))
    val stream = spark.readStream
      .schema(file(Seq(("k", "2024-03-01 00:00:00", 0L, "x"))).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingAnalytics.sequenceStream(stream,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("seqs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // C before B (out of order); the far point moves the watermark past
      // A and B so they finalize WITHOUT a complete trigram — the chain
      // must carry them into the next drain
      appendFile(src, file(Seq(
        ("u1", "2024-03-01 10:02:00", 3L, "C"),
        ("u1", "2024-03-01 10:01:00", 2L, "B"),
        ("u1", "2024-03-01 10:08:00", 9L, "D"))))
      q.processAllAvailable()
      appendFile(src, file(Seq(("zz", "2024-03-01 11:00:00", 99L, "x"))))
      q.processAllAvailable()
      appendFile(src, file(Seq(("zz", "2024-03-01 12:00:00", 98L, "x"))))
      q.processAllAvailable()
      val got = spark.table("seqs").filter(col("key") === "u1")
        .select("path").collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("A > B > C", "B > C > D"),
        s"trigram emissions wrong: $got")
    } finally q.stop()
  }

  test("holtWintersStream folds hours in event-time order with per-slot " +
      "seasonals, incrementally across watermark advances") {
    import spark.implicits._
    val src = tmp("graft_hw_src_")
    def file(rows: Seq[(String, String, Double)]): DataFrame =
      rows.toDF("key", "t", "value")
        .select(col("key"), col("t").cast("timestamp").as("ts"),
          col("value"))
    appendFile(src, file(Seq(("u1", "2024-03-01 10:30:00", 10.0))))
    val stream = spark.readStream
      .schema(file(Seq(("k", "2024-03-01 00:00:00", 0.0))).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingAnalytics.holtWintersStream(stream, alpha = 0.5,
        beta = 0.25, gamma = 0.125, watermark = "10 seconds")
      .writeStream.format("memory").queryName("hw")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // day-2 point arrives BEFORE the day-1 11:30 point (out of order);
      // both land in one file, so the fold must re-order by event time
      appendFile(src, file(Seq(
        ("u1", "2024-03-02 10:30:00", 30.0),
        ("u1", "2024-03-01 11:30:00", 20.0))))
      q.processAllAvailable()
      appendFile(src, file(Seq(("zz", "2024-03-04 00:00:00", 0.0))))
      q.processAllAvailable()
      appendFile(src, file(Seq(("zz", "2024-03-06 00:00:00", 0.0))))
      q.processAllAvailable()

      val snaps = spark.table("hw").filter(col("key") === "u1")
        .select("n_hours", "l", "b", "s_next").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1)
      assert(snaps.length >= 2, s"expected incremental drains: ${snaps.toSeq}")
      // hand fold (α=.5, β=.25, γ=.125, slots = hour of day):
      //  h1 slot10 x=10: l=10, b=0,      s10=0
      //  h2 slot11 x=20: l=.5*20+.5*10=15, b=.25*5=1.25, s11=.125*5=0.625
      //  h3 slot10 x=30: l=.5*30+.5*16.25=23.125,
      //                  b=.25*8.125+.75*1.25=2.96875,
      //                  s10=.125*6.875=0.859375
      // last slot 10 → s_next = s11 = 0.625 (all binary-exact doubles)
      val fin = snaps.last
      assert(fin == ((3L, 23.125, 2.96875, 0.625)),
        s"final Holt-Winters state mismatch: $fin")
    } finally q.stop()
  }

  test("gapfillInterpStream: empty buckets interpolate only once the right " +
      "endpoint closes; each bucket emits exactly once") {
    import spark.implicits._
    val src = tmp("graft_gapfill_src_")
    def file(rows: Seq[(String, String, Double)]): DataFrame =
      rows.toDF("key", "t", "value")
        .select(col("key"), col("t").cast("timestamp").as("ts"), col("value"))
    // observations at 10:00 (v=10) and 13:00 (v=40): gap buckets 11:00,
    // 12:00 must come out as 20, 30
    appendFile(src, file(Seq(("u1", "2024-03-01 10:10:00", 10.0))))
    val stream = spark.readStream
      .schema(file(Seq(("k", "2024-03-01 00:00:00", 0.0))).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingAnalytics.gapfillInterpStream(stream, "10 seconds")
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("append").start()
    def rows() = spark.table("gapfill").filter(col("key") === "u1")
      .select("bucket_us", "filled", "value_interp").collect()
      .map(r => (r.getLong(0) / 3600000000L % 24, r.getBoolean(1),
        r.getDouble(2))).sortBy(_._1).toSeq
    try {
      q.processAllAvailable()
      assert(rows().isEmpty, "10:00 is still open — nothing may emit")
      // watermark passes 11:00 → the 10:00 bucket closes and emits; the
      // gap after it must NOT emit (right endpoint unknown)
      appendFile(src, file(Seq(("zz", "2024-03-01 11:30:00", 0.0))))
      q.processAllAvailable()
      assert(rows() == Seq((10L, false, 10.0)),
        s"only the closed observed bucket may emit: ${rows()}")
      // second observation lands at 13:00, then the watermark closes it:
      // both gap buckets emit the line in the same drain
      appendFile(src, file(Seq(("u1", "2024-03-01 13:00:00", 40.0))))
      appendFile(src, file(Seq(("zz", "2024-03-01 15:00:00", 0.0))))
      q.processAllAvailable()
      assert(rows() == Seq((10L, false, 10.0), (11L, true, 20.0),
        (12L, true, 30.0), (13L, false, 40.0)),
        s"gap buckets must interpolate once the right endpoint closes: ${rows()}")
    } finally q.stop()
  }
}
