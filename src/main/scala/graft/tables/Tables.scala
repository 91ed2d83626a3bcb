package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All query entry points take a scale-factor directory and read the
  * parquet directly — filters/projections push down to the vectorized
  * parquet scan, so no caching or materialization happens here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped at two precisions across testdata
    * generations: nanosecond (which Spark's reader only surfaces as a
    * raw long via the legacy conf) and microsecond TIMESTAMP_NTZ
    * (isAdjustedToUTC=false, read natively). Dispatch on the loaded
    * dtype so both generations work: a LongType `ts` is legacy nanos
    * and gets the exact `div 1000` truncation (same as DuckDB's
    * TIMESTAMP_NS → TIMESTAMP cast); a timestamp `ts` passes through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    val base = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions
            .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case org.apache.spark.sql.types.TimestampNTZType => raw
      // NO silent catch-all: a tz-adjusted TIMESTAMP generation would
      // shift values against DuckDB's naive-µs oracle under any non-UTC
      // session — fail loudly so the bad generation is visible
      case other => throw new IllegalStateException(
        s"events.ts must be legacy-nanos LONG or TIMESTAMP_NTZ, got $other")
    }
    // A/B knob (r15, VERDICT r14 #6): widen a single-split events scan
    // to session width before consumers, the documents/embeddings
    // treatment. DEFAULT OFF — measured per query (see
    // OPTIMIZATION_r15.md): filters still push below the exchange, so
    // point lookups shuffle only surviving rows, but every full-table
    // aggregation loses scan-fused partial aggregation and shuffles raw
    // events instead of pre-aggregated groups. The ~50 event queries
    // are dominated by exactly those agg shapes.
    if (s.conf.getOption("spark.graft.events.widen").exists(_.toBoolean))
      graft.operators.TextDedup.widenForKernel(base,
        org.apache.spark.sql.functions.col("user_id"))
    else base
  }
  /** The two training-pipeline corpora fan out to the cluster width
    * before their (compute-heavy) consumers: the fixture files are a
    * single parquet row group, so without this every per-document map
    * stage — minhash signatures, fingerprints, simhash, quality scores —
    * runs on ONE core regardless of cluster size. The repartition is one
    * narrow shuffle of (id, text) / (id, vector); at production scale the
    * table arrives in many row groups and Catalyst's AQE coalesces the
    * then-redundant exchange to a near-no-op, while a pathologically
    * merged input (one giant row group after an aggressive compaction)
    * still fans out — the same reasoning as repartitioning before an
    * expensive UDF stage. */
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
