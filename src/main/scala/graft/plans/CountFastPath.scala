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
    minTs: Option[Long], maxTs: Option[Long])

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
      val dateDirs = fs.listStatus(projDir).filter(_.isDirectory)
        .filter { d =>
          d.getPath.getName.stripPrefix("date=") match {
            case ds if ds.nonEmpty =>
              val dd = java.time.LocalDate.parse(ds)
              !dd.isBefore(loDate) && !dd.isAfter(hiDate)
            case _ => false
          }
        }
      val files = dateDirs.flatMap(d => fs.listStatus(d.getPath))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
      if (files.isEmpty) return Some(Result(0L, 0, 0))

      val timeCol = table.meta.timeColumn
      val loMicros = micros(lo)
      val hiMicros = micros(hi)
      // distributed footer reads; no row data touched
      val stats = spark.sparkContext
        .parallelize(files.toSeq, math.max(1, files.length / 16))
        .map(p => readFooterStat(p, timeCol))
        .collect()

      val (full, boundary) = stats.partition(s =>
        s.minTs.exists(_ >= loMicros) && s.maxTs.exists(_ < hiMicros))
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

  /** Executor-side footer read: row count + time-column min/max. */
  private def readFooterStat(path: String, timeCol: String): FileStat = {
    val in = HadoopInputFile.fromPath(new Path(path), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      var minTs: Option[Long] = None
      var maxTs: Option[Long] = None
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
          }
        }
      }
      FileStat(path, rows, minTs, maxTs)
    } finally reader.close()
  }
}
