package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.TableSchema

/** Merge-on-read table over partitioned parquet — the Spark-native rendering
  * of the reference's write/flush/read pipeline (SURVEY.md §2.1 S1/S6, §2.9
  * X1/X2, §2.10 W3):
  *
  *  - **append** stamps the version column, derives the `date` partition from
  *    the event-time column, dedups within the batch (keep-greatest), sorts
  *    within partitions by the declared sort keys (files advertise the order;
  *    parquet min/max stats become tight so time-range scans prune), and
  *    writes `partitionBy(project_id, date)`;
  *  - **readResolved** is the read-side dedup view: one `row_number` window
  *    over the dedup keys ordered by tiebreak DESC NULLS LAST, then the
  *    tombstone filter — exactly DedupExec's keep-greatest semantics
  *    (`/root/reference/src/read_dedup.rs`), expressed so Catalyst handles
  *    filter placement (predicates on version-mutable columns stay above the
  *    window; partition/time predicates push through to the scan);
  *  - **update/delete** are version-append DML (reference `src/dml.rs` X2):
  *    they append new row versions / tombstones with a fresh tiebreak instead
  *    of rewriting files — O(changed rows), not O(table);
  *  - **compact** is the background dedup sweep (reference
  *    `dedup_partition`, `src/database.rs:6737`): collapse versions and
  *    rewrite, preserving the resolved view.
  *
  * Scale notes: every operation is partition-parallel; nothing collects to
  * the driver. The dedup window shuffles by dedupKeys only when a scan spans
  * file boundaries with the same key — at 100 TB the (project_id, date)
  * partitioning bounds each window partition to one tenant-day.
  */
class GraftTable(
    val spark: SparkSession,
    val root: String,
    val meta: TableSchema) {

  private val path = s"$root/${meta.name}"

  private def sortCols: Seq[Column] = meta.sortingColumns.map { k =>
    (k.descending, k.nullsFirst) match {
      case (true, true) => col(k.column).desc_nulls_first
      case (true, false) => col(k.column).desc_nulls_last
      case (false, true) => col(k.column).asc_nulls_first
      case (false, false) => col(k.column).asc_nulls_last
    }
  }

  /** Keep-greatest-by-tiebreak over the dedup keys; ties broken by the
    * tombstone flag (a delete wins over an update stamped at the same
    * microsecond) to keep the view deterministic. */
  private def dedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(meta.dedupKeys.map(col): _*)
      .orderBy(col(meta.dedupTiebreak).desc_nulls_last +:
        meta.tombstoneColumn.map(t => col(t).desc_nulls_last).toSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  private def tombstoneFilter(df: DataFrame): DataFrame =
    meta.tombstoneColumn match {
      case Some(t) => df.filter(!coalesce(col(t), lit(false)))
      case None => df
    }

  /** Stamp the version column and derive the date partition, then append.
    * `versionTime` is injectable for deterministic tests (the reference's
    * virtual-clock trick, `src/functions.rs:465-474`).
    */
  def append(df: DataFrame, versionTime: Option[java.time.LocalDateTime] = None): Unit = {
    val stamp: Column = versionTime
      .map(t => lit(t.toString).cast("timestamp_ntz"))
      .getOrElse(now().cast("timestamp_ntz"))
    val withVersion = df
      .withColumn(meta.dedupTiebreak, stamp)
      .withColumn("date", to_date(col(meta.timeColumn)))
    val withTombstone = meta.tombstoneColumn match {
      case Some(t) if !df.columns.contains(t) =>
        withVersion.withColumn(t, lit(false))
      case _ => withVersion
    }
    withTombstone
      .sortWithinPartitions(sortCols: _*)
      .write
      .mode(SaveMode.Append)
      .partitionBy(meta.partitions: _*)
      .parquet(path)
  }

  /** Raw physical rows — all versions, tombstones included. */
  def readRaw(): DataFrame = spark.read.parquet(path)

  /** The merge-on-read view: latest version per identity, tombstones out. */
  def readResolved(): DataFrame = tombstoneFilter(dedup(readRaw()))

  /** Version-append UPDATE (X2): append fresh versions of the matching
    * resolved rows with `assignments` applied. */
  def update(predicate: Column, assignments: Map[String, Column],
      versionTime: Option[java.time.LocalDateTime] = None): Unit = {
    val matched = readResolved().filter(predicate)
    val updated = assignments.foldLeft(matched) { case (d, (c, v)) =>
      d.withColumn(c, v)
    }
    append(updated.drop(meta.dedupTiebreak).drop("date"), versionTime)
  }

  /** Version-append DELETE: append tombstone versions. */
  def delete(predicate: Column,
      versionTime: Option[java.time.LocalDateTime] = None): Unit = {
    val t = meta.tombstoneColumn.getOrElse(
      throw new IllegalStateException(s"${meta.name} has no tombstone column"))
    val matched = readResolved().filter(predicate).withColumn(t, lit(true))
    append(matched.drop(meta.dedupTiebreak).drop("date"), versionTime)
  }

  /** Background dedup sweep: collapse versions, drop tombstoned identities,
    * rewrite sorted. Equivalent to the reference's `dedup_partition` /
    * OPTIMIZE pass; the resolved view is invariant under it.
    *
    * Writes to a sibling temp dir then swaps via filesystem rename — never
    * reads and overwrites the same files (a task retry mid-overwrite would
    * otherwise lose data).
    */
  def compact(): Unit = {
    val tmp = s"$path.__compact_tmp"
    readResolved()
      .sortWithinPartitions(sortCols: _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(meta.partitions: _*)
      .parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }
}
