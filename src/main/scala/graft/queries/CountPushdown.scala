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
      val r = Files.createTempDirectory("graft_count_").toString
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_count_fastpath" -> { (s, dir) =>
      val t = fixture(s, dir)
      val r = CountFastPath.countWindow(t, "2", Lo, Hi)
        .getOrElse(throw new IllegalStateException(
          "fast-path gate must hold on a compacted snapshot"))
      s.range(1).select(lit(r.count).as("n"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q36_count_fastpath" ->
      """SELECT count(*) AS n FROM events
        |WHERE user_id % 5 = 2
        |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02 12:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-05 06:00:00'""".stripMargin
  )
}
