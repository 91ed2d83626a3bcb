package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG-parity JSON rendering shared by `json_build_array` / `to_jsonb`.
  *
  * Semantics mirror the reference engine's `array_to_json_values`
  * (`/root/reference/src/functions.rs:978-1040`, pinned by its tests at
  * `:1606-1680`):
  *  - top-level strings that *look* like JSON (`{…}` / `[…]`) are parsed and
  *    embedded as real JSON (fallback: plain JSON string on parse failure);
  *  - elements inside list values are NEVER sniffed — PG `to_jsonb(text[])`
  *    keeps them JSON strings;
  *  - timestamps render as RFC3339 with `+00:00` offset and the smallest of
  *    {0,3,6} fractional digits that loses nothing;
  *  - output is compact (no spaces), serde/Jackson style.
  */
object PgJson {
  private val mapper = new ObjectMapper()

  private def looksJson(s: String): Boolean =
    (s.startsWith("{") && s.endsWith("}")) || (s.startsWith("[") && s.endsWith("]"))

  def escapeString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def rfc3339(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val us = Math.floorMod(micros, 1000000L).toInt
    // explicit pattern, NOT ISO_LOCAL_DATE_TIME: the ISO formatter omits
    // ":ss" when seconds==0, while the reference (chrono to_rfc3339,
    // functions.rs:1018) always emits seconds
    val base = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val frac =
      if (us == 0) ""
      else if (us % 1000 == 0) f".${us / 1000}%03d"
      else f".$us%06d"
    s"$base$frac+00:00"
  }

  /** Append `value` (a Catalyst internal value of type `dt`) as JSON. */
  def appendJson(value: Any, dt: DataType, sniff: Boolean,
      sb: java.lang.StringBuilder): Unit = value match {
    case null => sb.append("null")
    case _ => dt match {
      case StringType =>
        val s = value.asInstanceOf[UTF8String].toString
        if (sniff && looksJson(s)) {
          try sb.append(mapper.writeValueAsString(mapper.readTree(s)))
          catch { case _: Exception => escapeString(s, sb) }
        } else escapeString(s, sb)
      case ByteType | ShortType | IntegerType | LongType =>
        sb.append(value.toString)
      case FloatType => sb.append(value.asInstanceOf[Float].toDouble.toString)
      case DoubleType => sb.append(value.toString)
      case BooleanType => sb.append(value.toString)
      case _: DecimalType => sb.append(value.toString)
      case TimestampType | TimestampNTZType =>
        escapeString(rfc3339(value.asInstanceOf[Long]), sb)
      case VariantType =>
        // a variant IS json — append its canonical rendering verbatim
        sb.append(value.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
          .toJson(java.time.ZoneOffset.UTC))
      case ArrayType(elem, _) =>
        val arr = value.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          // list elements are never sniffed (PG to_jsonb(text[]) contract)
          appendJson(if (arr.isNullAt(i)) null else arr.get(i, elem), elem,
            sniff = false, sb)
          i += 1
        }
        sb.append(']')
      case _ =>
        // anything else renders through its string form (reference fallback)
        val s = String.valueOf(value)
        if (sniff && looksJson(s)) {
          try sb.append(mapper.writeValueAsString(mapper.readTree(s)))
          catch { case _: Exception => escapeString(s, sb) }
        } else escapeString(s, sb)
    }
  }
}

/** `json_build_array(args…) → utf8` — JSON array of the arguments with the
  * PG sniff rules above. Interpreted (CodegenFallback) but vectorization is
  * not the bottleneck for this function's use sites; promote to `doGenCode`
  * if it ever shows up hot.
  */
case class JsonBuildArray(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder
    sb.append('[')
    var i = 0
    while (i < children.length) {
      if (i > 0) sb.append(',')
      val c = children(i)
      PgJson.appendJson(c.eval(input), c.dataType, sniff = true, sb)
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `to_jsonb(x) → utf8` — single value through the same rendering rules. */
case class ToJsonb(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder
    PgJson.appendJson(child.eval(input), child.dataType, sniff = true, sb)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}
