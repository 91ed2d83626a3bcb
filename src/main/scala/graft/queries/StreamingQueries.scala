package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

import graft.schema.TableSchemas
import graft.sources.GraftTable
import graft.streaming.StreamingAnalytics
import graft.tables.Tables

/** Streaming results under the BATCH oracle gate: the continuous
  * aggregate (reference users' TimescaleDB-style downsampling, SURVEY
  * §2.10 / StreamingAnalytics) run as a bounded multi-batch file stream,
  * its update-mode emissions version-appended into a merge-on-read table,
  * and the RESOLVED table compared row-for-row against DuckDB's batch
  * aggregation of the same events. A green row proves the whole streaming
  * path — watermarked incremental aggregation, per-batch version stamps,
  * update-mode re-emission, keep-greatest resolution — converges to
  * exactly the batch answer. */
object StreamingQueries {

  private val built = scala.collection.concurrent.TrieMap[String, String]()

  private def aggTable(s: SparkSession, dir: String): GraftTable = {
    val root = built.getOrElseUpdate(dir, {
      val r = Files.createTempDirectory("graft_stream_agg_").toString
      // bounded source: the events table as 3 parquet files, consumed one
      // file per micro-batch (so buckets really are corrected across
      // batches, not computed in one shot)
      val srcDir = r + "/src"
      Tables.events(s, dir).select(
        (col("user_id") % 5).cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"))
        .repartition(3).write.parquet(srcDir)
      val src = s.readStream
        .schema(StructType(Seq(StructField("key", StringType),
          StructField("ts", TimestampType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val t = new GraftTable(s, r, TableSchemas.bucketCounts)
      // files arrive in no particular time order → a generous watermark so
      // no bucket is finalized while earlier-timestamped files are pending
      // (state stays bounded: keys × buckets of the fixture window)
      val q = StreamingAnalytics.continuousAggregate(src, t, "ts", "1 hour",
        "365 days", "key", r + "/chk", Trigger.AvailableNow(),
        stamp = Some(bid =>
          java.time.LocalDateTime.of(2024, 6, 1, 0, 0).plusSeconds(bid)))
      q.awaitTermination()
      r
    })
    new GraftTable(s, root, TableSchemas.bucketCounts)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_streaming_continuous_agg" -> { (s, dir) =>
      aggTable(s, dir).readResolved()
        .select(col("project_id"),
          col("timestamp").as("hour"), col("n"))
        .orderBy("project_id", "hour")
    }
  )

  val oracle: Map[String, String] = Map(
    "q51_streaming_continuous_agg" ->
      """SELECT CAST(user_id % 5 AS VARCHAR) AS project_id,
        | date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        | count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
