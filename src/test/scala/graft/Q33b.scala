package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
object Q33b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    val q = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
    q.explain("codegen")
    spark.stop()
  }
}
