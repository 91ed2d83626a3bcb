package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.GuardedTables

/** Flat (component, key, value) introspection table — the Spark rendering
  * of the reference's `timefusion_stats` table
  * (`/root/reference/src/stats_table.rs`): session/runtime facts plus
  * per-table storage-log state, registered as the `graft_stats` view so
  * dashboards query it with plain SQL.
  */
object GraftStats {

  def df(spark: SparkSession, tables: Seq[GraftTable] = Seq.empty): DataFrame = {
    val sc = spark.sparkContext
    val session = Seq(
      ("session", "spark_version", spark.version),
      ("session", "master", sc.master),
      ("session", "default_parallelism", sc.defaultParallelism.toString),
      ("session", "shuffle_partitions",
        spark.conf.get("spark.sql.shuffle.partitions", "")),
      ("session", "executors_active",
        sc.statusTracker.getExecutorInfos.length.toString),
      ("memory", "max_heap_bytes", Runtime.getRuntime.maxMemory.toString),
      ("guard", "guarded_roots", GuardedTables.count.toString))
    val perTable = tables.flatMap { t =>
      val c = t.currentVersion()
      Seq(
        (t.meta.name, "current_version", c.toString),
        (t.meta.name, "compact_snapshot", t.compactBaseDir().isDefined.toString),
        (t.meta.name, "partitions", t.meta.partitions.mkString(",")),
        (t.meta.name, "dedup_keys", t.meta.dedupKeys.mkString(",")),
        (t.meta.name, "logical_count",
          t.logicalCount().map(_.toString).getOrElse("")))
    }
    import spark.implicits._
    (session ++ perTable).toDF("component", "key", "value")
  }

  /** Register the introspection view (reference exposes it as a table). */
  def register(spark: SparkSession, tables: Seq[GraftTable] = Seq.empty): Unit =
    df(spark, tables).createOrReplaceTempView("graft_stats")
}
