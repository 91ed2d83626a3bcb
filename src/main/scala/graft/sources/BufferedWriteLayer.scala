package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** In-session write buffer over a [[GraftTable]] — the Spark rendering of
  * the reference's MemBuffer tier (S4/W2,
  * `/root/reference/src/buffered_write_layer.rs:1120` `insert`,
  * `src/mem_buffer.rs:255-470`): INSERTed rows are readable IMMEDIATELY,
  * before any parquet version commits, and [[flush]] moves every buffered
  * batch to storage as one committed version with its insert-time stamps
  * preserved — so the resolved view is IDENTICAL before and after a flush
  * (read-your-writes with no double counting, the same invariant the
  * reference's mem∪storage union maintains with its watermark routing).
  *
  * Durability (W1, reference `src/wal.rs:142-462` + `recover_from_wal`
  * at `buffered_write_layer.rs:1256`): with `durable = true` each insert
  * TEES its conformed batch to a `_wal/` parquet directory before
  * returning — the batch is durable from the moment insert returns, like
  * the reference's fsync'd WAL record. A new layer over the same table
  * REPLAYS committed WAL batches into its buffer (crash recovery), and
  * [[flush]] truncates the WAL only after the version commits. The
  * commit marker is parquet's own `_SUCCESS` file, so a batch whose spill
  * died mid-write is discarded at recovery — the analogue of losing the
  * un-fsynced WAL tail, except the un-committed INSERT also never
  * returned to its caller. A crash BETWEEN the flush's version commit and
  * the WAL truncate re-adopts already-committed rows; the re-flush is
  * harmless because replayed rows carry their original stamps and the
  * merge-on-read dedup window collapses identical (identity, stamp)
  * versions — the same at-least-once + dedup convergence the streaming
  * checkpoint recovery relies on. With `durable = false` (default) the
  * r1–r6 behavior is unchanged: durability starts at flush, a crashed
  * session loses its unflushed buffer.
  *
  * Single-owner contract: one live layer per table directory (the
  * reference's WAL flock). Recovery at construction adopts a CRASHED
  * predecessor's batches; two concurrently-live durable layers over one
  * table would double-adopt.
  *
  * Mechanics: each batch is conformed (stamped, date-derived,
  * schema-projected) at insert time and pinned with `localCheckpoint` —
  * in durable mode the checkpoint reads back the just-written WAL
  * parquet (a bounded local scan), NOT the caller's plan, and the
  * checkpoint rather than the WAL files backs every handed-out frame:
  * a reader that obtained the resolved view BEFORE a flush keeps
  * working after flush truncates the WAL (the spill's lifetime and the
  * frames' lifetimes must not be coupled). Reads never recompute the
  * caller's upstream plan and the buffered rows are immutable from the
  * moment they become visible.
  * Buffered batches resolve against storage through the same
  * keep-greatest dedup window as committed versions — a buffered update
  * of a stored identity wins by stamp, exactly as if it had been
  * committed.
  *
  * Scale: the buffer holds checkpointed partitions on executors (or WAL
  * parquet on table storage), never driver memory; `maxBufferedRows`
  * bounds it with an auto-flush, playing the reference's buffer-pressure
  * flush trigger (`flush_interval_secs` / pressure sawtooth, BASELINE.md).
  */
final class BufferedWriteLayer(val table: GraftTable,
    val maxBufferedRows: Long = 1000000L,
    val durable: Boolean = false) {

  // (pinned conformed batch, its WAL dir when durable)
  private var batches: List[(DataFrame, Option[String])] = Nil
  private var buffered: Long = 0L

  private def walRoot = s"${table.root}/${table.meta.name}/_wal"

  private def fs = new Path(walRoot)
    .getFileSystem(table.spark.sparkContext.hadoopConfiguration)

  // ---- crash recovery: adopt a crashed predecessor's committed batches
  if (durable) {
    val root = new Path(walRoot)
    if (fs.exists(root)) {
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .sortBy(_.getName).foreach { d =>
          if (fs.exists(new Path(d, "_SUCCESS"))) {
            // pin via checkpoint (not the files): flush truncates the WAL
            // while frames served from this batch may still be alive
            val df = table.spark.read.parquet(d.toString).localCheckpoint()
            val n = df.count()
            if (n > 0) { batches ::= ((df, Some(d.toString))); buffered += n }
            else fs.delete(d, true)
          } else fs.delete(d, true) // mid-write crash: the un-fsynced tail
        }
    }
  }

  /** Rows visible to [[readResolved]] but not yet committed to storage. */
  def bufferedRows: Long = synchronized(buffered)

  /** Buffer a batch; it is readable immediately (and, when durable,
    * crash-safe from return). `versionTime` is the batch's dedup stamp
    * (defaults to now, like an interactive INSERT). */
  def insert(df: DataFrame,
      versionTime: Option[java.time.LocalDateTime] = None): Unit = {
    val t = versionTime.getOrElse(java.time.LocalDateTime
      .now(java.time.ZoneOffset.UTC)
      .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
    val conformed = table.conformNow(df, t)
    val (pinned, walDir) =
      if (durable) {
        val micros =
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
        val dir = f"$walRoot/$micros%020d-${
          java.util.UUID.randomUUID.toString.take(8)}"
        conformed.write.parquet(dir) // _SUCCESS commits the record
        // checkpoint the READ-BACK (bounded local scan), so the buffered
        // frame outlives the WAL truncation at flush
        (table.spark.read.schema(conformed.schema).parquet(dir)
          .localCheckpoint(), Some(dir))
      } else (conformed.localCheckpoint(), None)
    val doFlush = synchronized {
      batches ::= ((pinned, walDir))
      buffered += pinned.count()
      buffered >= maxBufferedRows
    }
    if (doFlush) flush()
  }

  /** The table's resolved view INCLUDING buffered rows. */
  def readResolved(): DataFrame = synchronized {
    batches.map(_._1) match {
      case Nil => table.readResolved()
      case bs => table.readResolvedWithConformed(
        bs.reduce(_.unionByName(_, allowMissingColumns = true)))
    }
  }

  /** Commit every buffered batch as one table version (stamps preserved,
    * so the resolved view does not change), empty the buffer, and
    * truncate the WAL — AFTER the commit, so a crash in between re-adopts
    * (idempotently) rather than loses. */
  def flush(): Unit = {
    val toWrite = synchronized {
      val bs = batches
      batches = Nil
      buffered = 0L
      bs
    }
    if (toWrite.nonEmpty) {
      // allowMissingColumns: batches buffered across a schema evolution
      // differ in width; missing columns null-fill, like the files would
      table.appendConformed(
        toWrite.map(_._1).reduce(_.unionByName(_, allowMissingColumns = true)))
      toWrite.flatMap(_._2).foreach(d => fs.delete(new Path(d), true))
    }
  }
}
