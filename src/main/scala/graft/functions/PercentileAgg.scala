package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `percentile_agg(double) → binary` — t-digest sketch aggregate, partial- and
  * merge-safe across executors (SURVEY.md §2.4 A2; reference UDAF at
  * `/root/reference/src/functions.rs:1096-1209`). The serialized state is a
  * bounded ~3 KB regardless of input size, so partial aggregation (map-side
  * combine) keeps shuffle traffic O(groups), not O(rows).
  */
case class PercentileAggSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "percentile_agg"

  override def createAggregationBuffer(): TDigest =
    new TDigest(TDigest.DefaultCompression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    child.eval(input) match {
      case null =>
      case d: Double => buffer.add(d)
      case n: Number => buffer.add(n.doubleValue())
      case other => throw new IllegalArgumentException(
        s"percentile_agg expects a numeric input, got $other")
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.isEmpty) null else buffer.toBytes

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): PercentileAggSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PercentileAggSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PercentileAggSketch =
    copy(child = c)
}

/** `approx_percentile(p, digest) → double` — extract a quantile estimate from
  * a `percentile_agg` sketch (reference `functions.rs:1211-1267`).
  */
case class ApproxPercentileFromDigest(left: Expression, right: Expression)
  extends Expression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "approx_percentile"

  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    val bytes = right.eval(input)
    if (p == null || bytes == null) null
    else {
      val pd = p match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
      }
      if (pd < 0.0 || pd > 1.0)
        throw new IllegalArgumentException(
          s"approx_percentile: percentile must be between 0 and 1, got $pd")
      val q = TDigest.fromBytes(bytes.asInstanceOf[Array[Byte]]).quantile(pd)
      if (q.isNaN) null else q
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object PercentileAgg {
  /** Column API: `percentile_agg(col)` aggregate. */
  def percentile_agg(c: Column): Column =
    ColumnBridge.column(
      PercentileAggSketch(ColumnBridge.expression(c.cast("double")))
        .toAggregateExpression())

  /** Column API: `approx_percentile(p, digest)`. */
  def approx_percentile(p: Double, digest: Column): Column =
    ColumnBridge.column(ApproxPercentileFromDigest(
      org.apache.spark.sql.catalyst.expressions.Literal(p),
      ColumnBridge.expression(digest)))
}
