package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
object Q33Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    time("fp only")(docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .write.format("noop").mode("overwrite").save())
    time("fp+to_json")(docs.select(to_json(TextAnalysis.fingerprint(col("text"))).as("fp"))
      .write.format("noop").mode("overwrite").save())
    time("full q33")(graft.SparkEntry.queries("q33_fingerprint")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save())
    time("full q33 again")(graft.SparkEntry.queries("q33_fingerprint")(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
