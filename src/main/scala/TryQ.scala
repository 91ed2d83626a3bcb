import org.apache.spark.sql.SparkSession
object TryQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.DeferExpensiveProjection.install(spark)
    val sf = "/root/testdata/sf0.001"
    for (q <- args) {
      try {
        val n = graft.SparkEntry.queries(q)(spark, sf).count()
        println(s"OK $q rows=$n")
      } catch { case e: Throwable =>
        println(s"FAIL $q: ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
