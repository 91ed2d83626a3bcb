package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line the driver records.
  *
  * Measurement notes:
  *  - results are written to the `noop` sink, NOT `.count()` — count lets
  *    Catalyst prune unused projections, under-measuring projection-heavy
  *    queries (json builders, quality scores);
  *  - the session is warmed with one throwaway query first so the first
  *    measured query doesn't absorb JVM/codegen/parquet-footer startup;
  *  - failures print the stack to stderr and record -1 (visible, not
  *    swallowed).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.DeferExpensiveProjection.install(spark)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED")
          e.printStackTrace()
          -1.0
      }
    }

    run("q01_pricing_summary") // warm-up, unrecorded
    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
