package graft

import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftClock
import graft.schema.TableSchemas
import graft.sources.{GraftTable, ScanGate}

/** X3 wide-scan admission: depth classification, the pruned-work release
  * refinement, FAIR-pool routing while gated, and the concurrency bound. */
class ScanGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val H = 3600L * 1000000

  private def micros(t: LocalDateTime): Long =
    t.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L

  private def withClock[T](t: LocalDateTime)(f: => T): T = {
    GraftClock.set(micros(t))
    try f finally GraftClock.reset()
  }

  /** 72 hourly rows over 2024-03-01..03, one append → one file per
    * touched (project, date) directory. */
  private def fixture(): GraftTable = {
    val dir = Files.createTempDirectory("graft_gate_").toString
    val t = new GraftTable(spark, dir, TableSchemas.morVersioned)
    t.append(spark.range(72).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, id, 0, 0)")).as("timestamp"),
      concat(lit("row-"), col("id")).as("id"),
      concat(lit("name-"), col("id") % 4).as("name")),
      Some(LocalDateTime.of(2024, 3, 10, 0, 0)))
    t
  }

  test("shallow lookbacks are never gated") {
    withClock(LocalDateTime.of(2024, 3, 4, 0, 0)) {
      val t = fixture()
      val gate = new ScanGate(wideLookbackMicros = 24 * H)
      assert(!gate.isWide(t, Some(1 * H)))
      assert(!gate.isWide(t, Some(24 * H))) // exactly at the line: not deeper
      gate.run(spark, wide = false)(())
      assert(gate.stats("ungated") == 1 && gate.stats("gated") == 0)
    }
  }

  test("deep scan over substantial selected work is gated and runs in the wide pool") {
    withClock(LocalDateTime.of(2024, 3, 4, 0, 0)) {
      val t = fixture()
      val gate = new ScanGate(wideLookbackMicros = 24 * H, maxFiles = 0)
      assert(gate.isWide(t, Some(48 * H)))
      assert(gate.isWide(t, None)) // unbounded is always deep
      var poolDuring: String = null
      val n = gate.run(spark, wide = true) {
        poolDuring = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        t.readResolved().count()
      }
      assert(n == 72)
      assert(poolDuring == "graft_wide")
      assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
      assert(gate.stats("gated") == 1)
    }
  }

  test("pruned-small deep scan is released by the work refinement") {
    withClock(LocalDateTime.of(2024, 3, 4, 0, 0)) {
      val t = fixture()
      // 3 projects × ≤3 dates = ≤9 files, well under the default ceilings:
      // the depth rule fires but the selected work releases the scan
      val gate = new ScanGate(wideLookbackMicros = 24 * H)
      assert(!gate.isWide(t, Some(48 * H)))
      assert(gate.stats("released_by_work") == 1)
    }
  }

  test("deep recentPage waits on a saturated gate while a narrow page proceeds") {
    withClock(LocalDateTime.of(2024, 3, 4, 0, 0)) {
      val t = fixture()
      val gate = new ScanGate(wideLookbackMicros = 24 * H, maxFiles = 0,
        permits = 1)
      t.attachGate(gate)
      val held = new java.util.concurrent.CountDownLatch(1)
      val acquired = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => gate.run(spark, wide = true) {
        acquired.countDown(); held.await()
      })
      holder.start(); acquired.await()
      // narrow page: the newest date alone satisfies k, lookback stays at
      // the wide threshold → ungated, proceeds while the permit is held
      assert(t.recentPage(10).count() == 10)
      assert(gate.stats("ungated") >= 1)
      // deep page: widening past the newest date crosses the threshold
      // (maxFiles=0 disables the work release) → queues behind the permit
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val deep = new Thread(() => {
        if (t.recentPage(100).count() == 72) done.set(true)
      })
      deep.start()
      Thread.sleep(500)
      assert(!done.get(), "deep page must wait for the held permit")
      held.countDown()
      deep.join(120000); holder.join(10000)
      assert(done.get(), "deep page must complete once the permit frees")
      assert(gate.stats("throttled") >= 1)
    }
  }

  test("the semaphore bounds concurrent gated actions") {
    val gate = new ScanGate(permits = 1)
    val cur = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val threads = (1 to 2).map { _ =>
      new Thread(() => gate.run(spark, wide = true) {
        val c = cur.incrementAndGet()
        peak.getAndUpdate(p => math.max(p, c))
        Thread.sleep(300)
        cur.decrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(peak.get() == 1)
    assert(gate.stats("gated") == 2 && gate.stats("throttled") == 1)
  }
}
