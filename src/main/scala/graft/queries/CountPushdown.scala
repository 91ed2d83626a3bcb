package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.CountFastPath
import graft.schema.TableSchemas
import graft.sources.GraftTable
import graft.tables.Tables

/** A5 — COUNT(*) stats pushdown (reference `src/count_pushdown.rs`): the
  * headline dashboard count answered from parquet footers. The oracle
  * replays the same windowed count from the raw events table, so a green
  * row proves the footer arithmetic equals the real count.
  */
object CountPushdown {

  private val built = scala.collection.concurrent.TrieMap[String, String]()

  /** events → mor_versioned-shaped table, appended once then compacted
    * (the fast-path gate). */
  private def fixture(s: SparkSession, dir: String): GraftTable = {
    val root = built.getOrElseUpdate(dir, {
      val r = graft.tables.TempDirs.create("graft_count_")
      val t = new GraftTable(s, r, TableSchemas.morVersioned)
      val rows = Tables.events(s, dir).select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        col("event_id").cast("string").as("id"),
        col("event_type").as("name"))
      t.append(rows, Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
      t.compact()
      t.vacuum()
      r
    })
    new GraftTable(s, root, TableSchemas.morVersioned)
  }

  private val Lo = java.time.LocalDateTime.of(2024, 1, 2, 12, 0)
  private val Hi = java.time.LocalDateTime.of(2024, 1, 5, 6, 0)

  /** A6 fixture: the same events mapping written through a table with the
    * logical-count chain ON, then an update wave and a delete wave — and
    * crucially NO compaction, so the snapshot is exactly the shape the
    * footer fast path (A5) cannot serve. */
  private val builtIdx = scala.collection.concurrent.TrieMap[String, String]()

  private def indexedFixture(s: SparkSession, dir: String): GraftTable = {
    val root = builtIdx.getOrElseUpdate(dir, {
      val r = graft.tables.TempDirs.create("graft_lcount_")
      val t = new GraftTable(s, r, TableSchemas.morVersioned,
        maintainCountIndex = true)
      val rows = Tables.events(s, dir).select(
        (col("user_id") % 5).cast("string").as("project_id"),
        col("ts").as("timestamp"),
        col("event_id").cast("string").as("id"),
        col("event_type").as("name"))
      t.append(rows, Some(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
      t.update(col("id").cast("long") % 10 === 0,
        Map("name" -> lit("patched")),
        Some(java.time.LocalDateTime.of(2024, 6, 1, 1, 0)))
      t.delete(col("id").cast("long") % 17 === 0,
        Some(java.time.LocalDateTime.of(2024, 6, 1, 2, 0)))
      r
    })
    new GraftTable(s, root, TableSchemas.morVersioned,
      maintainCountIndex = true)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_count_fastpath" -> { (s, dir) =>
      val t = fixture(s, dir)
      val r = CountFastPath.countWindow(t, "2", Lo, Hi)
        .getOrElse(throw new IllegalStateException(
          "fast-path gate must hold on a compacted snapshot"))
      s.range(1).select(lit(r.count).as("n"))
    },

    // A6 — exact COUNT(*) on an UNcompacted MOR snapshot (3 live versions:
    // base + updates + tombstones) answered from the logical-count marker
    // chain, no dedup window, no data IO. The getOrElse throw makes a green
    // CORRECTNESS row a proof the MARKER value (not a fallback scan)
    // matches the oracle's windowed count.
    "q50_logical_count" -> { (s, dir) =>
      val t = indexedFixture(s, dir)
      val n = t.logicalCount().getOrElse(throw new IllegalStateException(
        "count chain must be intact on a maintained table"))
      s.range(1).select(lit(n).as("n"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q36_count_fastpath" ->
      """SELECT count(*) AS n FROM events
        |WHERE user_id % 5 = 2
        |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02 12:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-05 06:00:00'""".stripMargin,

    // identities are unique (event_id), updates keep them live, deletes
    // tombstone the %17 wave → resolved count = all but the deleted wave
    "q50_logical_count" ->
      """SELECT count(*) AS n FROM events WHERE event_id % 17 <> 0""".stripMargin
  )
}
