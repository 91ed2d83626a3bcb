package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorSearch
import graft.streaming.AnnIngestIndex

/** The ingest-side ANN index behind q148: committed survivors as
  * key-sorted LSH bucket segments, probed through a pushed key filter.
  * Pins (1) output EQUALITY with the brute per-batch bucket-join
  * (recall vs the exact probe is 1.0 by construction — same seed-fixed
  * family, exact cosine verify), (2) the 20-batch drain cost profile:
  * probe reads follow the batch's bucket mass while the base grows 20×,
  * the base is never re-hashed, and segments stay logarithmic. */
class AnnIngestIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Dim = 16

  private def vecs(lo: Int, hi: Int, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (lo until hi).map { i =>
      (i.toLong, Array.fill(Dim)(rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
  }

  /** A batch whose second half near-duplicates rows of `base` (scaled by
    * 1.01 — cosine ≈ 1), so probes have real hits. */
  private def batchWithDups(ids: Range, dupOf: DataFrame, seed: Int): DataFrame = {
    val fresh = vecs(ids.start, ids.start + ids.length / 2, seed)
    val dups = dupOf.limit(ids.length - ids.length / 2)
      .select((col("vec_id") + ids.start + 1000000L).as("vec_id"),
        transform(col("v"), x => x * 1.01).as("v"))
    fresh.unionByName(dups)
  }

  test("probe equals the brute bucket-join (cosineNearDupPairsAgainst)") {
    val dir = graft.tables.TempDirs.create("graft_annidx_")
    val idx = new AnnIngestIndex(spark, dir, "vec_id", "v", Dim,
      threshold = 0.9)
    var base: DataFrame = vecs(0, 0, 0)
    var batchStart = 0
    (1 to 3).foreach { b =>
      val batch = (if (b == 1) vecs(0, 120, b)
        else batchWithDups(batchStart until batchStart + 120, base, b))
        .localCheckpoint()
      val got = idx.probe(batch)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = VectorSearch.cosineNearDupPairsAgainst(batch, base,
          "vec_id", "v", Dim, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"batch $b: index probe diverged from the brute bucket-join " +
          s"(extra=${got -- want}, missing=${want -- got})")
      idx.add(batch)
      base = base.unionByName(batch).localCheckpoint()
      batchStart += 120
    }
  }

  test("20-batch drain: probes never re-hash the base, reads follow the " +
      "batch's bucket mass, segments stay logarithmic") {
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    def settle(): Long = {
      var last = -1L; var spins = 0
      while (recordsRead.get() != last && spins < 50) {
        last = recordsRead.get(); Thread.sleep(100); spins += 1
      }
      recordsRead.get()
    }
    val dir = graft.tables.TempDirs.create("graft_annidx20_")
    val idx = new AnnIngestIndex(spark, dir, "vec_id", "v", Dim,
      threshold = 0.9)
    val batchRows = 50
    val reads = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.sparkContext.addSparkListener(listener)
    try {
      (0 until 20).foreach { b =>
        val batch = vecs(b * batchRows, (b + 1) * batchRows, 1000 + b)
          .localCheckpoint()
        settle(); recordsRead.set(0L)
        val hits = idx.probe(batch).count()
        reads += settle()
        assert(hits == 0L, "independent gaussians must not near-dup")
        idx.add(batch)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // probe cost follows the batch's bucket mass, not the corpus: the
    // last probe faces 19x batch-1's base, yet reads stay within the
    // bucket-depth growth (keys x depth), far under a full base scan +
    // re-hash per batch (which would be >= indexedRows + batch rows)
    val early = reads.slice(2, 5).max
    val late = reads.slice(17, 20).max
    assert(late <= 4 * early,
      s"probe reads grew like a base scan: early=$early late=$late " +
        s"(reads=${reads.mkString(",")})")
    // maintenance stays amortized-log: each bucket row rewritten at most
    // log2(batches) times, and the segment count is logarithmic
    val totalBucketRows = idx.indexedRows
    assert(idx.segmentCount <= 6,
      s"${idx.segmentCount} segments after 20 equal adds")
    assert(idx.writtenRowsTotal <= totalBucketRows * 6,
      s"wrote ${idx.writtenRowsTotal} rows for $totalBucketRows indexed " +
        "— merge policy is rewriting more than the binary-counter bound")
  }
}
