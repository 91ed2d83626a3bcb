package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types.StructType

/** Arrow-IPC ingest (S7, the reference's gRPC bidi-stream handler,
  * `/root/reference/src/grpc_handlers.rs:24-191`): decode a sequence of
  * Arrow IPC record batches into a DataFrame and route it into a
  * [[GraftTable]] — the handler's body without the socket. No network
  * surface exists in this environment; the transport concerns the
  * reference implements around this decode (backpressure at 85% buffer
  * pressure, bearer auth) belong to a serving layer and are out of scope,
  * but the data path — IPC bytes → typed rows → conforming append /
  * buffered insert — is the real one, and the decode itself is
  * DISTRIBUTED: batch bytes parallelize to executors and deserialize
  * there, so a large push never materializes as driver rows.
  */
object ArrowIngest {

  /** Decode IPC record batches against the declared schema. */
  def toDataFrame(spark: SparkSession, schema: StructType,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowBridge.toDataFrame(batches, ArrowBridge.schemaJson(schema), spark)

  /** Decode and append as one committed version (the reference's
    * WriteBatch → buffered-write route, durability at commit). */
  def ingest(table: GraftTable, schema: StructType,
      batches: Iterator[Array[Byte]],
      versionTime: Option[java.time.LocalDateTime] = None): Unit =
    table.append(toDataFrame(table.spark, schema, batches), versionTime)

  /** Decode into the in-session buffer (immediate read visibility,
    * durability at flush — the reference's MemBuffer route). */
  def ingestBuffered(buffer: BufferedWriteLayer, schema: StructType,
      batches: Iterator[Array[Byte]],
      versionTime: Option[java.time.LocalDateTime] = None): Unit =
    buffer.insert(
      toDataFrame(buffer.table.spark, schema, batches), versionTime)
}
