package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.GraftTable

/** Structured-Streaming ingest into a [[GraftTable]] — the Spark rendering
  * of the reference's WAL → MemBuffer → flush pipeline (SURVEY.md §2.10
  * W1–W5; `/root/reference/src/buffered_write_layer.rs:1120,2211`,
  * `src/wal.rs`):
  *
  *  - the streaming checkpoint plays the WAL's role: offsets are committed
  *    only after the batch lands, so a crash replays the in-flight batch
  *    (`recover_from_wal`, `buffered_write_layer.rs:1256`);
  *  - each micro-batch is dedup'd in-batch on the table's dedup keys
  *    (reference `dedup_batches`, `src/mem_buffer.rs:637`), then appended
  *    through [[GraftTable.append]], which sorts by the declared sort keys —
  *    the flush-time sort of W3;
  *  - **replay idempotency**: the version stamp is a deterministic function
  *    of the batch id, so a replayed batch appends byte-identical row
  *    versions and the merge-on-read view collapses them — at-least-once
  *    delivery converges to exactly-once READS without a transactional
  *    sink. This is how the WAL+dedup pair gives the reference its
  *    exactly-once story, re-expressed on Spark's checkpoint.
  *
  * Divergence from the reference, documented: in-batch dedup keeps the
  * lexicographically-greatest payload rather than the last arrival —
  * micro-batch DataFrames have no stable arrival order, and a deterministic
  * winner is what makes replays idempotent.
  */
object StreamingIngest {

  /** Keep one row per dedup key: the lexicographically-greatest non-key
    * payload (deterministic under replays and reshuffles, unlike
    * `dropDuplicates`). */
  def dedupBatch(batch: DataFrame, keys: Seq[String]): DataFrame = {
    val others = batch.columns.filterNot(keys.contains).toSeq
    if (others.isEmpty) batch.distinct()
    else batch.groupBy(keys.map(col): _*)
      .agg(max(struct(others.map(col): _*)).as("__p"))
      .select(keys.map(col) ++ others.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Deterministic per-batch version stamp. Monotone in batch id, so a
    * later batch's rewrite of an identity wins the merge-on-read tiebreak;
    * identical across replays of the same batch id, so replays collapse. */
  def defaultStamp(batchId: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.of(2000, 1, 1, 0, 0).plusSeconds(batchId)

  /** Start the ingest stream. `source` is any streaming DataFrame conforming
    * to (a subset of) the table schema; `checkpoint` must be stable across
    * restarts — it carries the offset log that makes recovery exact. */
  def start(table: GraftTable, source: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      stamp: Long => java.time.LocalDateTime = defaultStamp): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.append(dedupBatch(batch, table.meta.dedupKeys), Some(stamp(batchId)))
      }
      .start()
}
