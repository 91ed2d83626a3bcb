package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Merge-on-read read-path semantics (SURVEY.md §2.9 X1, §1.3), oracle-checked:
  * a version-append table is synthesized from `events` (base inserts, an
  * UPDATE wave, a DELETE wave), then resolved with the keep-greatest dedup
  * window + tombstone filter — the exact contract of the reference's
  * DedupExec (`/root/reference/src/read_dedup.rs`) and
  * `tests/slt/merge_on_read.slt`.
  */
object MergeOnRead {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def versioned(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir).select(
      (col("user_id") % 5).cast("string").as("project_id"),
      col("ts").as("timestamp"),
      col("event_id").cast("string").as("id"),
      col("event_id").as("eid"),
      col("event_type").as("name"),
      col("value"),
      col("ts").as("updated_at"),
      lit(false).as("deleted"))
    val updates = base.filter(col("eid") % 10 === 0)
      .withColumn("value", col("value") * 2.0)
      .withColumn("updated_at", col("timestamp") + expr("INTERVAL 1 HOUR"))
    val tombstones = base.filter(col("eid") % 17 === 0)
      .withColumn("deleted", lit(true))
      .withColumn("updated_at", col("timestamp") + expr("INTERVAL 2 HOUR"))
    base.unionByName(updates).unionByName(tombstones)
  }

  /** Fixture for q55: a table fragmented by an update wave, PARTIALLY
    * compacted over half the touched date range, then fragmented again —
    * the read must stitch full base + partial base + appends (with the
    * anti-range exclusions) into exactly the last-writer-wins answer. */
  private val pcBuilt = scala.collection.concurrent.TrieMap[String, String]()

  private def pcTable(s: SparkSession, dir: String): graft.sources.GraftTable = {
    val root = pcBuilt.getOrElseUpdate(dir, {
      val r = graft.tables.TempDirs.create("graft_pcompact_")
      val t = new graft.sources.GraftTable(s, r,
        graft.schema.TableSchemas.morVersioned)
      t.append(Tables.events(s, dir).select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        col("event_id").cast("string").as("id"),
        col("event_type").as("name")),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
      t.compact()
      t.update(
        col("timestamp") >= lit("2024-01-05 00:00:00").cast("timestamp_ntz") &&
          col("timestamp") < lit("2024-01-15 00:00:00").cast("timestamp_ntz"),
        Map("name" -> concat(col("name"), lit("-u1"))),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 1, 0)))
      // partial compaction over HALF the fragmented range: 05–09 fold into
      // a partial base, 10–14 stay as raw append versions
      t.compactRange(java.time.LocalDate.of(2024, 1, 5),
        java.time.LocalDate.of(2024, 1, 9))
      t.update(expr("CAST(id AS BIGINT) % 7 = 0"), Map("name" -> lit("u2")),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 2, 0)))
      r
    })
    new graft.sources.GraftTable(s, root,
      graft.schema.TableSchemas.morVersioned)
  }

  /** Fixture for q89: three same-shape UPDATE…FROM waves deferred through
    * the DML coalescer and drained as ONE group (2 rounds — wave 3 overlaps
    * wave 1's keys). Sequential-equivalence is the oracle; commit-count
    * economics are pinned by DmlCoalescerSpec. */
  private val dmlcBuilt = scala.collection.concurrent.TrieMap[String, String]()

  private def dmlcTable(s: SparkSession, dir: String): graft.sources.GraftTable = {
    val root = dmlcBuilt.getOrElseUpdate(dir, {
      val r = graft.tables.TempDirs.create("graft_dmlc_")
      val t = new graft.sources.GraftTable(s, r,
        graft.schema.TableSchemas.morVersioned)
      val ev = Tables.events(s, dir)
      t.append(ev.select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        col("event_id").cast("string").as("id"),
        col("event_type").as("name")),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
      def wave(cond: org.apache.spark.sql.Column, tag: String) =
        ev.filter(cond).select(col("event_id").cast("string").as("id"),
          lit(tag).as("new_name"))
      val c = new graft.sources.DmlCoalescer()
      val clamp = Some(
        col("timestamp") >= lit("2024-01-01 00:00:00").cast("timestamp_ntz")
          && col("timestamp") < lit("2025-01-01 00:00:00").cast("timestamp_ntz"))
      val set = Map("name" -> col("s.new_name"))
      c.enqueue(t, wave(col("event_id") % 11 === 0, "w1"), Seq("id"), set, clamp)
      c.enqueue(t, wave(col("event_id") % 13 === 0, "w2"), Seq("id"), set, clamp)
      c.enqueue(t, wave(col("event_id") % 11 === 0 &&
        col("event_id") % 2 === 0, "w3"), Seq("id"), set, clamp)
      val (groups, stmts) = c.drain(
        Some(java.time.LocalDateTime.of(2024, 6, 1, 1, 0)))
      require(groups == 1 && stmts == 3,
        s"coalescer fixture: expected one 3-statement group, got ($groups, $stmts)")
      r
    })
    new graft.sources.GraftTable(s, root,
      graft.schema.TableSchemas.morVersioned)
  }

  /** Fixture for q98: events in a MOR table with an UPDATE wave, served
    * through the S5 hot tier — clock frozen at 2024-01-31, retention 48 h,
    * so the pinned slice covers [01-29, ∞) and a 72 h lookback stitches
    * the cold gap leg [01-28, 01-29) under it. */
  private val hotBuilt =
    scala.collection.concurrent.TrieMap[String, graft.sources.HotTier]()

  private val hotNow = java.time.LocalDateTime.of(2024, 1, 31, 0, 0)
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
  private val HourUs = 3600L * 1000000

  private def hotTier(s: SparkSession, dir: String): graft.sources.HotTier =
    hotBuilt.getOrElseUpdate(dir, {
      val r = graft.tables.TempDirs.create("graft_hot_")
      val t = new graft.sources.GraftTable(s, r,
        graft.schema.TableSchemas.morVersioned)
      t.append(Tables.events(s, dir).select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        col("event_id").cast("string").as("id"),
        col("event_type").as("name")),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
      t.update(expr("CAST(id AS BIGINT) % 9 = 0"),
        Map("name" -> concat(col("name"), lit("-u"))),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 1, 0)))
      val tier = new graft.sources.HotTier(t, retentionMicros = 48 * HourUs)
      graft.functions.GraftClock.set(hotNow)
      try require(tier.demote(), "hot tier demotion must pin the slice")
      finally graft.functions.GraftClock.reset()
      tier
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S5 hot tier: resolved read through the pinned slice + cold gap leg
    "q98_hot_tier_read" -> { (s, dir) =>
      val tier = hotTier(s, dir)
      graft.functions.GraftClock.set(hotNow)
      try tier.read(Some(72 * HourUs))
        .groupBy("name").agg(count(lit(1)).as("n"))
        .orderBy("name")
      finally graft.functions.GraftClock.reset()
    },

    // deferred DML coalescing (X2 / reference dml_coalescer.rs): three
    // statements fold into one group, rounds keep last-statement-wins
    "q89_dml_coalesce" -> { (s, dir) =>
      dmlcTable(s, dir).readResolved()
        .groupBy("name").agg(count(lit(1)).as("n"))
        .orderBy("name")
    },

    // incremental maintenance (W6 "date consolidation"): resolved read over
    // full base + partial base + post-compaction appends
    "q55_partial_compaction" -> { (s, dir) =>
      pcTable(s, dir).readResolved()
        .groupBy("name").agg(count(lit(1)).as("n"))
        .orderBy("name")
    },

    "q23_mor_dedup" -> { (s, dir) =>
      val all = versioned(s, dir)
      val w = Window.partitionBy(col("timestamp"), col("id"))
        .orderBy(col("updated_at").desc_nulls_last)
      all.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && !coalesce(col("deleted"), lit(false)))
        .groupBy("project_id", "name")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("project_id", "name")
    }
  )

  val oracle: Map[String, String] = Map(
    // the tier serves the same resolved view a cold read would: the UPDATE
    // wave applied everywhere, restricted to the 72 h lookback window
    "q98_hot_tier_read" ->
      """SELECT CASE WHEN event_id % 9 = 0 THEN event_type || '-u'
        |  ELSE event_type END AS name,
        | count(*) AS n
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-28 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // last-statement-wins across the three coalesced waves: w3 (wave 3)
    // overrides w1, w2 overrides w1 for keys in both, w3 overrides w2
    "q89_dml_coalesce" ->
      """SELECT CASE
        |  WHEN event_id % 11 = 0 AND event_id % 2 = 0 THEN 'w3'
        |  WHEN event_id % 13 = 0 THEN 'w2'
        |  WHEN event_id % 11 = 0 THEN 'w1'
        |  ELSE event_type END AS name,
        | count(*) AS n
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q55_partial_compaction" ->
      """SELECT CASE
        |  WHEN event_id % 7 = 0 THEN 'u2'
        |  WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
        |   AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-15 00:00:00'
        |  THEN event_type || '-u1'
        |  ELSE event_type END AS name,
        | count(*) AS n
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_mor_dedup" ->
      """WITH base AS (
        | SELECT CAST(user_id % 5 AS VARCHAR) AS project_id,
        |        CAST(ts AS TIMESTAMP) AS timestamp,
        |        CAST(event_id AS VARCHAR) AS id,
        |        event_id AS eid,
        |        event_type AS name,
        |        value,
        |        CAST(ts AS TIMESTAMP) AS updated_at,
        |        false AS deleted
        | FROM events),
        |versions AS (
        | SELECT * FROM base
        | UNION ALL
        | SELECT project_id, timestamp, id, eid, name, value * 2.0,
        |        timestamp + INTERVAL 1 HOUR, false
        | FROM base WHERE eid % 10 = 0
        | UNION ALL
        | SELECT project_id, timestamp, id, eid, name, value,
        |        timestamp + INTERVAL 2 HOUR, true
        | FROM base WHERE eid % 17 = 0),
        |resolved AS (
        | SELECT *, row_number() OVER (PARTITION BY timestamp, id
        |   ORDER BY updated_at DESC NULLS LAST) AS rn
        | FROM versions)
        |SELECT project_id, name, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM resolved
        |WHERE rn = 1 AND NOT coalesce(deleted, false)
        |GROUP BY project_id, name
        |ORDER BY project_id, name""".stripMargin
  )
}
