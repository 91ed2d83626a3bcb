package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.functions._

import graft.sources.GraftTable

/** Metadata-only COUNT(*) for time-windowed tenant counts — the Spark
  * rendering of the reference's count pushdown
  * (`/root/reference/src/count_pushdown.rs:1-472`): answer
  * `COUNT(*) WHERE project_id = p AND ts ∈ [lo, hi)` from parquet footer
  * row counts for every file whose time-column min/max statistics prove it
  * fully inside the window; only boundary files are actually scanned.
  *
  * Gates (the reference's, adapted to the commit-marker log): the snapshot
  * must be a single compaction base — a compacted snapshot is exactly the
  * resolved view (unique identities, tombstones dropped), so raw file row
  * counts ARE logical row counts. Mid-append snapshots or version stacks
  * fall back to the caller's normal resolved count (`None`).
  *
  * Scale design: partition pruning happens on the DRIVER as directory-name
  * arithmetic (project_id=<p>/date=<d> for d in the window), footers are
  * read DISTRIBUTED (one task per file batch — at 100 TB the footer listing
  * is millions of files; a driver loop would be the bottleneck), and only
  * boundary files (≤ 2 per tenant-day with sorted writes) touch row data.
  */
object CountFastPath {

  /** Diagnostics: how the count was assembled. */
  case class Result(count: Long, footerOnlyFiles: Int, scannedFiles: Int)

  private case class FileStat(path: String, rows: Long,
    minTs: Option[Long], maxTs: Option[Long], nullCount: Option[Long])

  /** `Some(result)` when the fast path applies, `None` otherwise. */
  def countWindow(table: GraftTable, projectId: String,
      lo: java.time.LocalDateTime, hi: java.time.LocalDateTime): Option[Result] = {
    table.compactBaseDir().flatMap { base =>
      val spark = table.spark
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(base).getFileSystem(conf)
      val projDir = new Path(base, s"project_id=$projectId")
      if (!fs.exists(projDir)) return Some(Result(0L, 0, 0))
      // driver-side partition pruning: date dirs intersecting [lo, hi)
      val loDate = lo.toLocalDate
      val hiDate = hi.toLocalDate
      // unparseable dir names (__HIVE_DEFAULT_PARTITION__ from a null event
      // time, or anything unexpected) are NOT prunable: keep them, and let
      // footer stats / the boundary scan classify their files — null-ts
      // rows then drop out through the timestamp predicate, matching the
      // reference's conservative (min?, max?, records?) gating
      // (count_pushdown.rs)
      val dateDirs = fs.listStatus(projDir).filter(_.isDirectory)
        .filter { d =>
          val ds = d.getPath.getName.stripPrefix("date=")
          scala.util.Try(java.time.LocalDate.parse(ds)).toOption match {
            case Some(dd) => !dd.isBefore(loDate) && !dd.isAfter(hiDate)
            case None => true
          }
        }
      val files = dateDirs.flatMap(d => fs.listStatus(d.getPath))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
      if (files.isEmpty) return Some(Result(0L, 0, 0))

      val timeCol = table.meta.timeColumn
      val loMicros = micros(lo)
      val hiMicros = micros(hi)
      // distributed footer reads; no row data touched. The session's Hadoop
      // conf rides along — a fresh Configuration() on the executor would
      // lose credentials/endpoints on any non-local filesystem (S3A).
      val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
      val stats = spark.sparkContext
        .parallelize(files.toSeq, math.max(1, files.length / 16))
        .map(p => readFooterStat(p, timeCol, serConf.value))
        .collect()

      // footer-only requires zero nulls in the time column: a null-ts row
      // inside an otherwise-in-window file would be counted by the footer
      // but excluded by the predicate (overcount)
      val (full, boundary) = stats.partition(s =>
        s.minTs.exists(_ >= loMicros) && s.maxTs.exists(_ < hiMicros) &&
          s.nullCount.contains(0L))
      val inWindow = boundary.filter(s =>
        s.minTs.forall(_ < hiMicros) && s.maxTs.forall(_ >= loMicros))
      val footerCount = full.map(_.rows).sum
      val scannedCount =
        if (inWindow.isEmpty) 0L
        else spark.read.schema(table.meta.schema)
          .parquet(inWindow.map(_.path).toIndexedSeq: _*)
          .filter(col(timeCol) >= lit(lo.toString).cast("timestamp_ntz") &&
            col(timeCol) < lit(hi.toString).cast("timestamp_ntz"))
          .count()
      Some(Result(footerCount + scannedCount, full.length, inWindow.length))
    }
  }

  private def micros(t: java.time.LocalDateTime): Long =
    t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L

  /** Executor-side footer read: row count + time-column min/max/null count.
    * `nullCount` is None when any block's statistics omit it — callers must
    * then treat the file as not-footer-only. */
  private def readFooterStat(path: String, timeCol: String,
      conf: Configuration): FileStat = {
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      var minTs: Option[Long] = None
      var maxTs: Option[Long] = None
      var nulls: Option[Long] = Some(0L)
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val colIt = b.getColumns.iterator()
        while (colIt.hasNext) {
          val c = colIt.next()
          if (c.getPath.toDotString == timeCol) {
            val st = c.getStatistics
            if (st != null && st.hasNonNullValue) {
              val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
              val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
              minTs = Some(minTs.fold(mn)(math.min(_, mn)))
              maxTs = Some(maxTs.fold(mx)(math.max(_, mx)))
            }
            nulls =
              if (st == null || !st.isNumNullsSet) None
              else nulls.map(_ + st.getNumNulls)
          }
        }
      }
      FileStat(path, rows, minTs, maxTs, nulls)
    } finally reader.close()
  }
}
