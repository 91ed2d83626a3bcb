package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.schema.TableSchemas
import graft.sources.GraftTable
import graft.tables.Tables

/** Variant-typed tables END-TO-END (SURVEY.md §1.2/§1.4, F8/F9): an
  * `otel_logs_and_spans` fixture is written THROUGH [[GraftTable]] with real
  * Spark 4 `VariantType` columns (parquet Variant metadata+value pairs, the
  * same physical encoding the reference stores via delta-kernel's
  * unshredded variant — `/root/reference/src/schema_loader.rs:311-317`),
  * merge-on-read updated, then queried with `variant_get`, `jsonb_path_*`
  * and the PG `->>` text semantics — the shapes of
  * `/root/reference/tests/slt/variant_column.slt` and
  * `distinct_on_variant.slt`.
  *
  * The DuckDB oracle replays the same logic from the raw `events` JSON
  * strings — so these rows verify that JSON survives the full
  * string → variant → parquet → variant → access round trip unchanged.
  */
object VariantTable {

  /** Build the fixture table in a fresh temp dir: events mapped onto the
    * otel schema (body/attributes as parse_json variants), appended through
    * the commit-marker log, then one MOR UPDATE wave (level of 'error' rows
    * escalated) so the read exercises version resolution over variant
    * columns too. */
  /** One build per scale dir per JVM: the fixture is deterministic (fixed
    * version stamps), so q34/q35 share the written table. */
  private val built = scala.collection.concurrent.TrieMap[String, String]()

  private def fixtureTable(s: SparkSession, dir: String): GraftTable =
    new GraftTable(s, built.getOrElseUpdate(dir, build(s, dir)),
      TableSchemas.otelLogsAndSpans)

  private def fixture(s: SparkSession, dir: String): DataFrame =
    fixtureTable(s, dir).readResolved()

  private def build(s: SparkSession, dir: String): String = {
    val root = graft.tables.TempDirs.create("graft_variant_")
    val t = new GraftTable(s, root, TableSchemas.otelLogsAndSpans)
    val k = get_json_object(col("props"), "$.k").cast("long")
    val rows = Tables.events(s, dir).select(
      (col("user_id") % 5).cast("string").as("project_id"),
      col("ts").as("timestamp"),
      col("event_id").cast("string").as("id"),
      col("event_type").as("name"),
      lit("SERVER").as("kind"),
      lit("OK").as("status_code"),
      when(col("event_type") === "error", "ERROR").otherwise("INFO").as("level"),
      (col("value") * 1000).cast("long").as("duration"),
      col("ts").as("start_time"),
      array(col("event_type")).as("hashes"),
      parse_json(format_string("""{"message":"%s","nested":{"k":%s}}""",
        col("event_type"), k)).as("body"),
      parse_json(col("props")).as("attributes"))
    t.append(rows, Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
    t.update(col("name") === "error", Map("level" -> lit("FATAL")),
      Some(java.time.LocalDateTime.of(2024, 6, 1, 1, 0)))
    root
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // variant_column.slt shapes: typed get, path-exists, ->> in a predicate,
    // aggregation over variant-extracted values, post-update resolution
    "q34_variant_table" -> { (s, dir) =>
      fixture(s, dir)
        .filter(F.jsonb_path_exists(col("attributes"), "k"))
        .filter(F.jsonb_path_text(col("body"), "message") === col("name"))
        .withColumn("k", variant_get(col("attributes"), "$.k", "long"))
        .groupBy("level", "name")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(F.jsonb_path_text(col("body"), "nested.k").cast("long")).as("max_k"))
        .orderBy("level", "name")
    },

    // BASELINE trace_lookup shape (the reference's worst pre-index number,
    // 5.6-6.7 s): point lookup by id through the full MOR read path. The
    // id columns carry parquet bloom filters (otelLogsAndSpans
    // bloomFilterColumns), so row groups whose dictionary/bloom exclude the
    // key are skipped without decoding — the Spark-native rendering of the
    // reference's tantivy-sidecar prefilter (SURVEY §2.2 S3 replacement).
    "q44_trace_lookup" -> { (s, dir) =>
      fixture(s, dir)
        .filter(col("project_id") === "2" && col("id") === "500")
        .select(col("project_id"), col("id"), col("name"), col("level"),
          col("timestamp"))
    },

    // q13 shape THROUGH the storage engine with a timestamp-only window:
    // TimeToDatePruning must derive the date partition bounds (no explicit
    // date predicate), and the result must match the oracle exactly
    "q45_mor_time_window" -> { (s, dir) =>
      fixture(s, dir)
        .filter(col("timestamp") >= lit("2024-01-10 06:00:00").cast("timestamp_ntz") &&
          col("timestamp") < lit("2024-01-12 06:00:00").cast("timestamp_ntz"))
        .groupBy(date_trunc("hour", col("timestamp"))
          .cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour")
    },

    // PG jsonpath FILTER predicates (reference src/functions.rs:1273-1502,
    // lax mode): `base ? (@.field > n)` against the variant body column,
    // replayed by the oracle from the raw JSON
    "q46_jsonpath_filter" -> { (s, dir) =>
      F.registerAll(s)
      fixture(s, dir)
        .filter(expr("jsonb_path_exists(body, '$.nested ? (@.k > 50)')"))
        .groupBy("level").agg(count(lit(1)).as("n"))
        .orderBy("level")
    },

    // BASELINE recent_page shape via the bounded top-k (T1): ORDER BY
    // timestamp DESC LIMIT 100 over the resolved view, scanning only the
    // newest date partitions (GraftTable.recentPage widens geometrically
    // until 100 rows survive resolution — the reference's early-terminating
    // TopK, ordered_union_for_topk.rs, rendered at the partition level)
    "q48_recent_page" -> { (s, dir) =>
      fixtureTable(s, dir)
        .recentPage(100, Seq(col("id").desc))
        .select(col("project_id"), col("id"), col("name"), col("level"),
          col("timestamp"))
    },

    // Time travel (the reference inherits Delta's `VERSION AS OF`): the
    // resolved view as of v1, BEFORE the MOR update wave escalated error
    // rows to FATAL — old snapshots stay exactly reconstructable from the
    // commit-marker log until vacuum reclaims them
    "q52_time_travel" -> { (s, dir) =>
      fixtureTable(s, dir).readResolvedAsOf(1)
        .groupBy("level", "name")
        .agg(count(lit(1)).as("n"), max(col("duration")).as("max_duration"))
        .orderBy("level", "name")
    },

    // Snapshot diff (Delta CDF / table_changes): the changes between the
    // initial load (v1) and the MOR update wave (v2) are exactly one
    // update_preimage + update_postimage pair per escalated error row —
    // no inserts, no deletes; the oracle replays that from raw events
    "q105_snapshot_diff" -> { (s, dir) =>
      fixtureTable(s, dir).snapshotDiff(1, 2)
        .select(col("change_type"), col("id"), col("name"), col("level"),
          col("duration"))
        .orderBy("id", "change_type")
    },

    // MemBuffer tier (S4/W2): rows INSERTed through the buffered write
    // layer are visible to the resolved read BEFORE any parquet version
    // commits — the mem ∪ storage union read, resolved through the same
    // keep-greatest window as committed versions
    "q54_buffered_read" -> { (s, dir) =>
      val t = fixtureTable(s, dir)
      val buf = new graft.sources.BufferedWriteLayer(t)
      val extra = Tables.events(s, dir).filter(col("event_id") < 100).select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        concat(lit("buf-"), col("event_id")).as("id"),
        col("event_type").as("name"),
        lit("BUFFERED").as("level"))
      buf.insert(extra, Some(java.time.LocalDateTime.of(2024, 6, 1, 2, 0)))
      buf.readResolved()
        .groupBy("level").agg(count(lit(1)).as("n"))
        .orderBy("level")
    },

    // distinct_on_variant.slt shape: DISTINCT ON (project_id) latest row,
    // outer projection reading variant columns from the deduped subquery
    "q35_variant_distinct_on" -> { (s, dir) =>
      val w = Window.partitionBy(col("project_id"))
        .orderBy(col("timestamp").desc, col("id"))
      fixture(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("project_id"), col("id"),
          F.jsonb_path_text(col("body"), "message").as("message"),
          variant_get(col("attributes"), "$.k", "long").as("k"),
          (!is_variant_null(try_variant_get(col("body"), "$.nested", "variant")))
            .as("has_nested"))
        .orderBy("project_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q34_variant_table" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'FATAL' ELSE 'INFO' END AS level,
        | event_type AS name,
        | count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q44_trace_lookup" ->
      """SELECT CAST(user_id % 5 AS VARCHAR) AS project_id,
        | CAST(event_id AS VARCHAR) AS id,
        | event_type AS name,
        | CASE WHEN event_type = 'error' THEN 'FATAL' ELSE 'INFO' END AS level,
        | CAST(ts AS TIMESTAMP) AS timestamp
        |FROM events
        |WHERE user_id % 5 = 2 AND event_id = 500""".stripMargin,

    "q45_mor_time_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 06:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 06:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_jsonpath_filter" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'FATAL' ELSE 'INFO' END AS level,
        | count(*) AS n
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q48_recent_page" ->
      """SELECT CAST(user_id % 5 AS VARCHAR) AS project_id,
        | CAST(event_id AS VARCHAR) AS id,
        | event_type AS name,
        | CASE WHEN event_type = 'error' THEN 'FATAL' ELSE 'INFO' END AS level,
        | CAST(ts AS TIMESTAMP) AS timestamp
        |FROM events
        |ORDER BY CAST(ts AS TIMESTAMP) DESC, CAST(event_id AS VARCHAR) DESC
        |LIMIT 100""".stripMargin,

    "q52_time_travel" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END AS level,
        | event_type AS name,
        | count(*) AS n,
        | max(CAST(value * 1000 AS BIGINT)) AS max_duration
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q105_snapshot_diff" ->
      """WITH err AS (
        | SELECT CAST(event_id AS VARCHAR) AS id, event_type AS name,
        |  CAST(trunc(value * 1000) AS BIGINT) AS duration
        | FROM events WHERE event_type = 'error')
        |SELECT * FROM (
        | SELECT 'update_preimage' AS change_type, id, name,
        |  'ERROR' AS level, duration FROM err
        | UNION ALL
        | SELECT 'update_postimage' AS change_type, id, name,
        |  'FATAL' AS level, duration FROM err)
        |ORDER BY id, change_type""".stripMargin,

    "q54_buffered_read" ->
      """SELECT level, count(*) AS n FROM (
        |  SELECT CASE WHEN event_type = 'error' THEN 'FATAL' ELSE 'INFO' END AS level
        |  FROM events
        |  UNION ALL
        |  SELECT 'BUFFERED' AS level FROM events WHERE event_id < 100
        |) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_variant_distinct_on" ->
      """WITH ranked AS (
        | SELECT CAST(user_id % 5 AS VARCHAR) AS project_id,
        |        CAST(event_id AS VARCHAR) AS id,
        |        event_type AS message,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |        row_number() OVER (PARTITION BY user_id % 5
        |          ORDER BY CAST(ts AS TIMESTAMP) DESC, CAST(event_id AS VARCHAR)) AS rn
        | FROM events)
        |SELECT project_id, id, message, k, true AS has_nested
        |FROM ranked WHERE rn = 1 ORDER BY project_id""".stripMargin
  )
}
