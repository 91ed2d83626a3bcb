package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Bridge to the `private[sql]` Arrow IPC converters — the decode/encode
  * pair behind Spark's own Arrow exchange paths. Lives under the
  * `org.apache.spark.sql` package tree like [[ColumnBridge]] (standard
  * extension-library shim, no behavior of its own).
  */
object ArrowBridge {

  /** Arrow IPC record-batch bytes → DataFrame (distributed decode: bytes
    * parallelize to executors and deserialize there). */
  def toDataFrame(batches: Iterator[Array[Byte]], schemaJson: String,
      spark: SparkSession): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** DataFrame → Arrow IPC record-batch bytes, driver-side (test/harness
    * encoder for the ingest path — the role a network client plays). */
  def toBatchBytes(df: DataFrame, maxRecordsPerBatch: Long): Iterator[Array[Byte]] =
    ArrowConverters.toBatchIterator(
      df.queryExecution.executedPlan.executeCollect().iterator,
      df.schema, maxRecordsPerBatch, "UTC",
      true, false, null)

  def schemaJson(s: StructType): String = s.json
}
