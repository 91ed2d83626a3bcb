package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch state: at most `capacity` counters.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after any sequence of updates and
  * merges over a stream of N items, every item with true count
  * > N/(capacity+1) is present, and each kept counter underestimates its
  * true count by at most N/(capacity+1). The sketch is therefore a
  * guaranteed-superset CANDIDATE generator for "count ≥ φ·N" whenever
  * φ > 1/(capacity+1) — an exact second pass over just the candidates
  * makes the final answer exact (see `TextAnalysis.heavyHitters`).
  */
final class MgSketch(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]()

  def update(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // decrement-all: drop one occurrence of `capacity` kept items AND
        // the arriving item — the classic (capacity+1)-way cancellation
        // that yields the N/(capacity+1) bound. O(capacity) on a full
        // miss, amortized O(1) per cancelled count; per-task buffers see
        // task-sized streams, so the pass cost stays bounded by split
        // size regardless of corpus size.
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - 1 }
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity subtract
    * the (capacity+1)-th largest count from all and drop non-positives —
    * the error bounds of both inputs ADD, keeping the global guarantee. */
  def merge(other: MgSketch): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - kth }
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** `misra_gries(token, capacity) → map<string,long>` aggregate: the kept
  * counters (lower bounds on true counts). Partial/merge-safe; the state is
  * ≤ capacity entries regardless of input size, so map-side combine keeps
  * the shuffle O(capacity) per task. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgSketch = new MgSketch(capacity)

  override def update(buffer: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: MgSketch, other: MgSketch): MgSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgSketch): Any = {
    val entries = buffer.counts.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buffer: MgSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new MgSketch(in.readInt())
    var n = in.readInt()
    while (n > 0) { sk.counts.update(in.readUTF(), in.readLong()); n -= 1 }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGries {
  /** Column API: `misra_gries(col, capacity)` aggregate. */
  def misra_gries(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
