package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.VectorSearch
import graft.queries.TrainingData
import graft.tables.Tables

/** Recall measurement for the hash-seeded approximate family at ANY scale
  * dir — the correctness status the oracle gate cannot give them (ANN
  * candidates depend on random plane/codebook seeds; SemDeDup's cell
  * blocking is lossy by design). The exact reference is bounded either
  * way: brute-force top-k over the 20 fixed query vectors (20 × corpus,
  * linear), and the planted near-dup pairs (id, id+1000000 at id%20==0)
  * whose construction the q47 oracle replays. Run against
  * `/tmp/graft_sf1_full` this closes the last sf1 status gap:
  * q29/q42/q91 get measured recall@5, q75 a measured planted-pair
  * elimination rate, at 10× the bench scale.
  *
  * Usage: `runMain graft.SampledRecall` (env: SPARK_GRAFT_SF_DIR).
  * Prints one JSON line.
  */
object SampledRecall {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1_full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // measure the SHIPPED query entries (whatever parameter scaling they
    // apply), not re-parameterized operator calls
    def res(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

    val exact = res("q28_cosine_topk")
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val nExact = exact.count().toDouble

    def recall(approx: DataFrame): Double =
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .count() / nExact

    val rLsh = recall(res("q29_ann_lsh"))
    val rIvf = recall(res("q42_ann_ivf"))
    val rPq = recall(res("q91_ann_pq"))

    // SemDeDup: of the deterministically planted near-dup pairs
    // (cosine ≈ 0.997, far above the 0.95 threshold), how many did the
    // cell-blocked dedup actually collapse (not both members kept)?
    val corpus = TrainingData.nearDupCorpus(spark, dir)
    val dedup = res("q75_semantic_dedup").localCheckpoint()
    val planted = corpus.filter(col("vec_id") < 1000000 &&
        col("vec_id") % 20 === 0)
      .select(col("vec_id").as("lo"), (col("vec_id") + 1000000L).as("hi"))
    val kept = dedup.filter(col("keep")).select(col("vec_id"))
    val bothKept = planted
      .join(kept.select(col("vec_id").as("lo")), Seq("lo"), "left_semi")
      .join(kept.select(col("vec_id").as("hi")), Seq("hi"), "left_semi")
      .count()
    val nPlanted = planted.count()
    val elim = 1.0 - bothKept.toDouble / nPlanted

    spark.stop()
    println(
      f"""{"metric":"sampled_recall","dir":"$dir","k":5,"queries":20,""" +
        f""""q29_ann_lsh_recall":$rLsh%.4f,"q42_ann_ivf_recall":$rIvf%.4f,""" +
        f""""q91_ann_pq_recall":$rPq%.4f,"q75_semantic_dedup":""" +
        f"""{"planted_pairs":$nPlanted,"both_kept":$bothKept,""" +
        f""""elimination_rate":$elim%.4f}}""")
  }
}
