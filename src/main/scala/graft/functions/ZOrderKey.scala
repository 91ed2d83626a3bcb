package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) key over up to 8 columns — the sort key compaction uses
  * for multi-column locality (reference `z_order_columns`,
  * `schemas/mor_versioned.yaml:31-33`; Delta OPTIMIZE ZORDER equivalent).
  *
  * Each input maps to an unsigned 64-bit rank (numeric/timestamp values
  * order-preserving via sign-bit flip; strings/binary by first 8 bytes,
  * which preserves lexicographic order at the resolution that matters for
  * file skipping), then bits interleave round-robin. Files written in key
  * order carry tight min/max ranges on EVERY participating column, so
  * range predicates on any of them prune row groups.
  */
case class ZOrderKey(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.size <= 8,
    "z-order key takes 1..8 columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"

  /** Order-preserving unsigned 64-bit rank. The MSB-first interleave
    * consumes each column's TOP 64/n bits, so narrow types must place their
    * value bits at the TOP of the rank (shift left) — mapped into the low
    * bits they would contribute near-constant zeros and the column would
    * silently add no entropy to the key. */
  private def rank(value: Any, dt: DataType): Long = {
    if (value == null) return 0L // nulls first
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        value.asInstanceOf[Long] ^ Long.MinValue
      case IntegerType | DateType =>
        (value.asInstanceOf[Int].toLong ^ 0x80000000L) << 32
      case ShortType => (value.asInstanceOf[Short].toLong ^ 0x8000L) << 48
      case ByteType => (value.asInstanceOf[Byte].toLong ^ 0x80L) << 56
      case DoubleType =>
        // IEEE754 total order: negatives map (reversed) below, positives above
        val bits = java.lang.Double.doubleToLongBits(value.asInstanceOf[Double])
        if (bits < 0) ~bits else bits ^ Long.MinValue
      case FloatType =>
        val bits = java.lang.Float.floatToIntBits(value.asInstanceOf[Float])
        val u = if (bits < 0) (~bits).toLong & 0xffffffffL
          else bits.toLong | 0x80000000L
        u << 32
      case StringType =>
        prefix8(value.asInstanceOf[UTF8String].getBytes) ^ Long.MinValue
      case BinaryType => prefix8(value.asInstanceOf[Array[Byte]]) ^ Long.MinValue
      case _ => value.hashCode().toLong ^ Long.MinValue
    }
  }

  private def prefix8(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v ^ Long.MinValue // undone by the caller's flip; keeps bytes unsigned
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val ranks = new Array[Long](n)
    var i = 0
    while (i < n) {
      ranks(i) = rank(children(i).eval(input), children(i).dataType)
      i += 1
    }
    // interleave: take bits from the top, round-robin across columns
    var key = 0L
    var bit = 0
    while (bit < 64) {
      val col = bit % n
      val srcBit = 63 - (bit / n) // consume each column's bits MSB-first
      key = (key << 1) | ((ranks(col) >>> srcBit) & 1L)
      bit += 1
    }
    key ^ Long.MinValue // unsigned bit order → signed comparator order
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderKey {
  def apply(cols: Seq[Column]): Column =
    ColumnBridge.column(ZOrderKey(cols.map(ColumnBridge.expression)))
}
