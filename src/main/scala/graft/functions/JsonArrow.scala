package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** PG `->` / `->>` accessor with datafusion-functions-json semantics
  * (reference `src/functions.rs:91-303` ExprPlanner + the
  * datafusion-functions-json dependency):
  *
  *  - `->` returns the raw JSON SLICE of the value at `key` — for plain
  *    JSON-string input the original text (spacing preserved, exactly what
  *    the reference's json_get returns); for Variant input the canonical
  *    compact rendering;
  *  - `->>` (`text = true`) returns PG text semantics: strings unescaped,
  *    numbers/bools literal, JSON null → SQL NULL, containers as the slice.
  *
  * Chains compose because a slice is itself JSON text.
  */
case class JsonArrow(child: Expression, key: Expression,
    isIndex: Boolean, text: Boolean)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, key)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (text) "pg_arrow_text" else "pg_arrow"

  private lazy val factory = new JsonFactory()

  override def eval(input: InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) return null
    val json = child.dataType match {
      case VariantType =>
        c.asInstanceOf[VariantVal].toJson(java.time.ZoneOffset.UTC)
      case _ => c.toString
    }
    val k = key.eval(input)
    if (k == null) return null
    val out =
      if (isIndex) extractIndex(json, k.toString.toInt)
      else extractKey(json, k.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  private def extractKey(json: String, key: String): String = {
    val p = factory.createParser(json)
    try {
      val first = p.nextToken()
      if (first != JsonToken.START_OBJECT) {
        // datafusion json_as_text: ->>'' on a scalar unwraps the scalar
        if (text && key.isEmpty && first != JsonToken.START_ARRAY)
          return slice(json, p)
        return null
      }
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        p.nextToken() // move to the value
        if (name == key) return slice(json, p)
        p.skipChildren()
      }
      null
    } finally p.close()
  }

  private def extractIndex(json: String, idx: Int): String = {
    val p = factory.createParser(json)
    try {
      if (p.nextToken() != JsonToken.START_ARRAY) return null
      var i = 0
      while (p.nextToken() != JsonToken.END_ARRAY) {
        if (i == idx) return slice(json, p)
        p.skipChildren()
        i += 1
      }
      null
    } finally p.close()
  }

  /** Parser is positioned ON the value token; return its rendering.
    * Containers are sliced from the original text (spacing preserved —
    * datafusion json_get semantics); scalars are reconstructed from the
    * token (their literal form is canonical anyway, and Jackson's lazy
    * string decoding makes end offsets unreliable for scalars). */
  private def slice(json: String, p: com.fasterxml.jackson.core.JsonParser): String = {
    val tok = p.currentToken()
    tok match {
      case JsonToken.VALUE_NULL => if (text) null else "null"
      case JsonToken.VALUE_STRING =>
        if (text) p.getText
        else {
          val sb = new java.lang.StringBuilder
          PgJson.escapeString(p.getText, sb)
          sb.toString
        }
      case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT |
           JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => p.getText
      case _ =>
        val start = p.currentTokenLocation().getCharOffset.toInt
        p.skipChildren() // consume the container
        val end = p.currentLocation().getCharOffset.toInt
        json.substring(start, end).trim
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), key = newChildren(1))
}

/** Reference `variant_to_json`: Variant → canonical compact JSON text;
  * already-JSON text (an arrow-chain slice) passes through unchanged; SQL
  * NULL (a missed `variant_get` path) renders as JSON `null`, matching the
  * reference's rendering of variant-null. */
case class VariantToJson(child: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "variant_to_json"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = v match {
      case null => "null"
      case vv: VariantVal => vv.toJson(java.time.ZoneOffset.UTC)
      case other => other.toString
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
