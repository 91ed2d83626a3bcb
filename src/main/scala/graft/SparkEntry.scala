package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CountPushdown, MergeOnRead, MultimodalQueries, Relational, SampledSimilarity, StreamingQueries, TimeSeries, TrainingData, VariantTable}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module packs; each key is one operator
  * from the SURVEY.md §2 inventory, and `oracleSql` holds the DuckDB
  * equivalent the driver uses as correctness oracle.
  */
object SparkEntry {
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (TimeSeries.queries, TimeSeries.oracle),
    (MergeOnRead.queries, MergeOnRead.oracle),
    (TrainingData.queries, TrainingData.oracle),
    (VariantTable.queries, VariantTable.oracle),
    (CountPushdown.queries, CountPushdown.oracle),
    (MultimodalQueries.queries, MultimodalQueries.oracle),
    (StreamingQueries.queries, StreamingQueries.oracle),
    (SampledSimilarity.queries, SampledSimilarity.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** Queries whose CONSTRUCTION builds a memoized on-disk fixture
    * (bounded streaming replays, MOR fixture tables, variant/count
    * tables, the FTS doc store): the bench constructs exactly these in
    * its unrecorded warm-up so no timed pass can carry a fixture
    * (re)build. Deliberately NOT all queries — constructing the pure
    * compute-heavy packs (sampled similarity, training data) runs their
    * eager output pins too, and that warm-up residue measured a
    * +0.05–0.15 s GC tax across the timed sub-second queries. */
  def fixtureQueries: Set[String] =
    StreamingQueries.queries.keySet ++ MergeOnRead.queries.keySet ++
      VariantTable.queries.keySet ++ CountPushdown.queries.keySet ++
      Set("q49_text_prefilter", "q99_text_rowgroup") // docStore users

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}
