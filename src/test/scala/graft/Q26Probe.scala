package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextDedup
object Q26Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.tables.Tables.documents(spark, dir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    // warm
    docs.count()
    val sigs = time("signatures")(
      TextDedup.minhashSignatures(docs, "doc_id", "text", 96)
        .write.format("noop").mode("overwrite").save())
    val cands = TextDedup.minhashCandidates(docs, "doc_id", "text", 12, 8)
    val nc = time("candidates count")(cands.count())
    println(s"[probe] candidates: $nc")
    time("full verified")(
      TextDedup.verifiedMinhashPairs(docs, "doc_id", "text", 12, 8, 0.9)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
