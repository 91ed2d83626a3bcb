package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling driver, not part of the suite
object Q47Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = graft.queries.TrainingData.nearDupCorpus(spark, dir)
    time("warmup")(corpus.count())

    // replicate cosineNearDupPairs legs with timings
    import graft.operators.VectorSearch
    val m = VectorSearch.getClass.getDeclaredMethods
    val c = corpus.select(col("vec_id").as("__id"), col("v").as("__v"))
    val planesM = VectorSearch.getClass.getDeclaredMethod(
      "planes", classOf[Int], classOf[Int], classOf[Long])
    planesM.setAccessible(true)
    val sigM = VectorSearch.getClass.getDeclaredMethods
      .find(_.getName == "signature").get
    sigM.setAccessible(true)
    val numTables = 10; val planesPerTable = 12; val seed = 97L
    val cols = (0 until numTables).map { t =>
      val pl = planesM.invoke(VectorSearch, Int.box(planesPerTable),
        Int.box(64), Long.box(seed + t)).asInstanceOf[Seq[Array[Double]]]
      val planesLit = typedLit(pl.map(_.toSeq))
      struct(lit(t).as("table"),
        sigM.invoke(VectorSearch, col("__v"), planesLit,
          Int.box(planesPerTable)).asInstanceOf[org.apache.spark.sql.Column]
          .as("key"))
    }
    val bucketed = c.withColumn("__b", explode(array(cols: _*)))
      .select(col("__id"), col("__b.table").as("table"), col("__b.key").as("key"))
      .cache()
    time("signatures (bucketed count)")(println(bucketed.count()))
    time("signatures again")(println(bucketed.count()))
    val cands = bucketed.as("a").join(bucketed.as("b"),
        col("a.table") === col("b.table") && col("a.key") === col("b.key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    time("raw candidates")(println(cands.count()))
    val dist = cands.distinct()
    time("distinct candidates")(println(dist.count()))
    val verified = dist
      .join(c.select(col("__id").as("id_a"), col("__v").as("__va")), "id_a")
      .join(c.select(col("__id").as("id_b"), col("__v").as("__vb")), "id_b")
      .withColumn("cosine", VectorSearch.cosine(col("__va"), col("__vb"), 64))
      .filter(col("cosine") >= 0.9)
    time("verify")(println(verified.count()))
    spark.stop()
  }
}
