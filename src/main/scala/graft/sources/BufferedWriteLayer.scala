package graft.sources

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
  * Divergence from the reference, stated plainly: there is no WAL under
  * this buffer — durability starts at flush (or at the streaming
  * checkpoint when ingest runs through [[graft.streaming.StreamingIngest]]);
  * a crashed session loses its unflushed buffer, where the reference
  * loses only its un-fsynced WAL tail (≤200 ms).
  *
  * Mechanics: each batch is conformed (stamped, date-derived,
  * schema-projected) at insert time and pinned with `localCheckpoint`, so
  * reads never recompute the caller's upstream plan and the buffered rows
  * are immutable from the moment they become visible. Buffered batches
  * resolve against storage through the same keep-greatest dedup window as
  * committed versions — a buffered update of a stored identity wins by
  * stamp, exactly as if it had been committed.
  *
  * Scale: the buffer holds `localCheckpoint`ed partitions on executors
  * (not driver memory); `maxBufferedRows` bounds it with an auto-flush,
  * playing the reference's buffer-pressure flush trigger
  * (`flush_interval_secs` / pressure sawtooth, BASELINE.md).
  */
final class BufferedWriteLayer(val table: GraftTable,
    val maxBufferedRows: Long = 1000000L) {

  private var batches: List[DataFrame] = Nil
  private var buffered: Long = 0L

  /** Rows visible to [[readResolved]] but not yet committed to storage. */
  def bufferedRows: Long = synchronized(buffered)

  /** Buffer a batch; it is readable immediately. `versionTime` is the
    * batch's dedup stamp (defaults to now, like an interactive INSERT). */
  def insert(df: DataFrame,
      versionTime: Option[java.time.LocalDateTime] = None): Unit = {
    val t = versionTime.getOrElse(java.time.LocalDateTime
      .now(java.time.ZoneOffset.UTC)
      .truncatedTo(java.time.temporal.ChronoUnit.MICROS))
    val pinned = table.conformNow(df, t).localCheckpoint()
    val doFlush = synchronized {
      batches ::= pinned
      buffered += pinned.count()
      buffered >= maxBufferedRows
    }
    if (doFlush) flush()
  }

  /** The table's resolved view INCLUDING buffered rows. */
  def readResolved(): DataFrame = synchronized {
    batches match {
      case Nil => table.readResolved()
      case bs => table.readResolvedWithConformed(
        bs.reduce(_.unionByName(_, allowMissingColumns = true)))
    }
  }

  /** Commit every buffered batch as one table version (stamps preserved,
    * so the resolved view does not change) and empty the buffer. */
  def flush(): Unit = {
    val toWrite = synchronized {
      val bs = batches
      batches = Nil
      buffered = 0L
      bs
    }
    if (toWrite.nonEmpty)
      // allowMissingColumns: batches buffered across a schema evolution
      // differ in width; missing columns null-fill, like the files would
      table.appendConformed(
        toWrite.reduce(_.unionByName(_, allowMissingColumns = true)))
  }
}
