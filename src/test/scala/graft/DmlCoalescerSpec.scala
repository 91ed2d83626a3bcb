package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.{DmlCoalescer, GraftTable}

/** Deferred UPDATE…FROM batching (reference `src/dml_coalescer.rs`):
  * same-shape statements fold into fewer commits than statements, the
  * result is exactly sequential application, clamps widen to the group
  * union, and failed groups park instead of dropping. */
class DmlCoalescerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshTable(): GraftTable = {
    val dir = Files.createTempDirectory("graft_dmlc_").toString
    new GraftTable(spark, dir, TableSchemas.morVersioned)
  }

  private def seed(t: GraftTable, n: Int = 100): Unit = {
    import spark.implicits._
    t.append(spark.range(n).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, 0, id, 0)")).as("timestamp"),
      concat(lit("row-"), col("id")).as("id"),
      concat(lit("name-"), col("id") % 4).as("name")),
      Some(java.time.LocalDateTime.of(2024, 3, 2, 0, 0)))
  }

  private def src(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("id", "new_name")
  }

  private val setName = Map("name" -> col("s.new_name"))

  test("same-shape statements fold into max-multiplicity rounds, " +
      "result == sequential application, last statement wins") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer()
    // 3 statements, one overlapping key (row-5 in #2 and #3) → 2 rounds
    val s1 = src("row-1" -> "a", "row-2" -> "a", "row-3" -> "a")
    val s2 = src("row-5" -> "b", "row-6" -> "b", "row-7" -> "b")
    val s3 = src("row-5" -> "c")
    val v0 = t.currentVersion()
    c.enqueue(t, s1, Seq("id"), setName)
    c.enqueue(t, s2, Seq("id"), setName)
    c.enqueue(t, s3, Seq("id"), setName)
    assert(c.pendingStatements == 3)
    val (groups, stmts) = c.drain(
      Some(java.time.LocalDateTime.of(2024, 3, 2, 1, 0)))
    assert((groups, stmts) == (1, 3))
    assert(c.pendingStatements == 0)
    // 3 statements → 2 commits (round count = max key multiplicity)
    assert(t.currentVersion() == v0 + 2)
    // equivalence oracle: the same statements applied sequentially
    val ref = freshTable(); seed(ref)
    val on = col("t.id") === col("s.id")
    Seq(s1, s2, s3).zipWithIndex.foreach { case (s, i) =>
      ref.updateFrom(s, on, setName,
        Some(java.time.LocalDateTime.of(2024, 3, 2, 1, i + 1)))
    }
    val got = t.readResolved().select("id", "name")
    val exp = ref.readResolved().select("id", "name")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
    assert(got.filter(col("id") === "row-5").head().getString(1) == "c")
  }

  test("different assignment shapes form separate groups; per-statement " +
      "clamps widen to the group union window") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer()
    val lo = lit("2024-03-01 00:00:00").cast("timestamp_ntz")
    val mid = lit("2024-03-01 00:30:00").cast("timestamp_ntz")
    val hi = lit("2024-03-01 01:40:00").cast("timestamp_ntz")
    // shape A twice, each clamped to its own half-window
    c.enqueue(t, src("row-10" -> "early"), Seq("id"), setName,
      Some(col("timestamp") >= lo && col("timestamp") < mid))
    c.enqueue(t, src("row-50" -> "late"), Seq("id"), setName,
      Some(col("timestamp") >= mid && col("timestamp") < hi))
    // shape B (different assignment expr) → its own group
    c.enqueue(t, src("row-20" -> "ignored"), Seq("id"),
      Map("deleted" -> lit(true)))
    val (groups, stmts) = c.drain(
      Some(java.time.LocalDateTime.of(2024, 3, 2, 1, 0)))
    assert((groups, stmts) == (2, 3))
    val byId = t.readResolved()
      .select("id", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("row-10") == "early")
    assert(byId("row-50") == "late")
    assert(!byId.contains("row-20")) // tombstoned by shape B
  }

  test("a failing group parks with its error, other groups still merge; " +
      "discardQuarantined is the explicit give-up") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer()
    // bad: source has no `id` column → join analysis fails at drain
    import spark.implicits._
    val bad = Seq(("row-1", "x")).toDF("wrong_key", "new_name")
    c.enqueue(t, bad, Seq("id"), setName)
    c.enqueue(t, src("row-2" -> "ok"), Seq("id"),
      Map("name" -> concat(col("s.new_name"), lit("!"))))
    val (groups, stmts) = c.drain(
      Some(java.time.LocalDateTime.of(2024, 3, 2, 1, 0)))
    assert((groups, stmts) == (1, 1))
    assert(c.quarantined.size == 1)
    assert(c.quarantined.keys.head.startsWith("mor_versioned[id]"))
    assert(c.pendingStatements == 1) // parked statement still pending
    // the good group landed
    assert(t.readResolved().filter(col("name") === "ok!").count() == 1)
    // retry drains nothing new (still failing), stays parked
    assert(c.drain() == (0, 0) && c.quarantined.size == 1)
    assert(c.discardQuarantined() == 1)
    assert(c.pendingStatements == 0 && c.quarantined.isEmpty)
  }

  test("empty source statements drain as a no-op, not an error") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer()
    c.enqueue(t, src().limit(0), Seq("id"), setName)
    c.enqueue(t, src("row-1" -> "x").filter(lit(false)), Seq("id"), setName)
    val v0 = t.currentVersion()
    assert(c.drain() == (1, 2)) // one group, both statements folded away
    assert(t.currentVersion() == v0) // zero rounds -> zero commits
    assert(c.quarantined.isEmpty && c.pendingStatements == 0)
  }

  test("maxAgeMillis: an aged queue drains on the next enqueue or drainIfDue tick") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer(maxAgeMillis = 0) // everything is instantly due
    // age 0 is due the instant the timer arms — every enqueue drains
    c.enqueue(t, src("row-1" -> "x"), Seq("id"), setName)
    c.enqueue(t, src("row-2" -> "y"), Seq("id"), setName)
    assert(c.pendingStatements == 0)
    val idle = new DmlCoalescer(maxAgeMillis = 0)
    idle.enqueue(t, src("row-3" -> "z"), Seq("id"), setName)
    assert(idle.pendingStatements == 0 || idle.drainIfDue() == (1, 1))
    assert(idle.pendingStatements == 0)
    // an un-aged queue does NOT drain on the tick
    val young = new DmlCoalescer(maxAgeMillis = 3600000)
    young.enqueue(t, src("row-4" -> "q"), Seq("id"), setName)
    assert(young.drainIfDue() == (0, 0) && young.pendingStatements == 1)
  }

  test("randomized: coalesced drain == sequential application (5 seeds)") {
    // property pin for the ordered-rounds semantics: any batch of
    // same-shape statements with arbitrary key overlap must resolve to
    // exactly the state sequential application produces
    for (seedVal <- 1 to 5) {
      val rnd = new scala.util.Random(seedVal)
      val t = freshTable(); seed(t, 30)
      val ref = freshTable(); seed(ref, 30)
      val c = new DmlCoalescer()
      val statements = (0 until 4).map { si =>
        val keys = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30))
          .distinct.map(i => s"row-$i")
        src(keys.map(k => k -> s"s$si-$k"): _*)
      }
      statements.foreach(st => c.enqueue(t, st, Seq("id"), setName))
      c.drain(Some(java.time.LocalDateTime.of(2024, 3, 2, 1, 0)))
      val on = col("t.id") === col("s.id")
      statements.zipWithIndex.foreach { case (st, i) =>
        ref.updateFrom(st, on, setName,
          Some(java.time.LocalDateTime.of(2024, 3, 2, 1, i + 1)))
      }
      val got = t.readResolved().select("id", "name")
      val exp = ref.readResolved().select("id", "name")
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"divergence at seed $seedVal")
    }
  }

  test("autoDrainAfter triggers a drain on enqueue") {
    val t = freshTable(); seed(t)
    val c = new DmlCoalescer(autoDrainAfter = 2)
    c.enqueue(t, src("row-1" -> "x"), Seq("id"), setName)
    assert(c.pendingStatements == 1)
    c.enqueue(t, src("row-2" -> "y"), Seq("id"), setName)
    assert(c.pendingStatements == 0) // auto-drained at the threshold
    val byId = t.readResolved().select("id", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("row-1") == "x" && byId("row-2") == "y")
  }
}
