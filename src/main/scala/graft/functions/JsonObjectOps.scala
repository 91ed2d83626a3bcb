package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JSON-text builders behind the reference's Variant constructor family
  * (`/root/reference/src/functions.rs:446-450`: `VariantObjectConstruct`,
  * `VariantObjectInsert`, `VariantListConstruct`, `VariantListInsert`,
  * `CastToVariantUdf` — registered there, exercised nowhere, so semantics
  * follow the PG/Snowflake conventions their names come from).
  *
  * Each builder renders JSON text with the [[PgJson]] value rules (the same
  * sniff/RFC3339 conventions as `json_build_array`/`to_jsonb`); the SQL
  * registrations in [[F]] wrap them in `parse_json` so the SQL surface
  * returns true Variant values. Write-path-only ergonomics — interpreted
  * eval is fine here, these never sit under a scan loop.
  */
object JsonObjectOps {
  private val mapper = new ObjectMapper()

  /** Render one argument as a JSON-text fragment with PgJson value rules. */
  private[functions] def fragment(value: Any, dt: DataType): String = {
    val sb = new java.lang.StringBuilder
    PgJson.appendJson(value, dt, sniff = true, sb)
    sb.toString
  }

  private[functions] def parse(json: String, what: String) =
    try mapper.readTree(json)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$what: input is not valid JSON: ${e.getMessage}")
    }

  private[functions] def compact(n: com.fasterxml.jackson.databind.JsonNode): String =
    mapper.writeValueAsString(n)
}

/** `variant_object_construct(k1, v1, k2, v2, …) → utf8 JSON object`.
  * Keys must evaluate to non-null strings; values render with the PG sniff
  * rules. Duplicate keys: last wins (Jackson `set` replaces).
  */
case class JsonBuildObject(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length % 2 == 0,
    "variant_object_construct expects alternating key, value arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder
    sb.append('{')
    val seen = new java.util.LinkedHashMap[String, String]()
    var i = 0
    while (i < children.length) {
      val k = children(i).eval(input)
      if (k == null) throw new IllegalArgumentException(
        "variant_object_construct: object key must not be null")
      val frag = JsonObjectOps.fragment(
        children(i + 1).eval(input), children(i + 1).dataType)
      seen.put(k.toString, frag)
      i += 2
    }
    val it = seen.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(',')
      first = false
      PgJson.escapeString(e.getKey, sb)
      sb.append(':').append(e.getValue)
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `variant_object_insert(obj, key, value) → utf8 JSON object` — set/replace
  * `key` in a JSON object (upsert; replaced keys keep their position, new
  * keys append). Errors on non-object input.
  */
case class JsonObjectInsert(obj: Expression, key: Expression, value: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(obj, key, value)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val o = obj.eval(input)
    if (o == null) return null
    val k = key.eval(input)
    if (k == null) throw new IllegalArgumentException(
      "variant_object_insert: key must not be null")
    val node = JsonObjectOps.parse(
      JsonObjectOps.fragment(o, obj.dataType) match {
        // a JSON-string fragment means the input was rendered as a quoted
        // scalar — only objects are insertable
        case s if s.startsWith("{") => s
        case other => throw new IllegalArgumentException(
          s"variant_object_insert: input is not a JSON object: $other")
      }, "variant_object_insert")
    val on = node.asInstanceOf[ObjectNode]
    val frag = JsonObjectOps.fragment(value.eval(input), value.dataType)
    on.set(k.toString, JsonObjectOps.parse(frag, "variant_object_insert value"))
    UTF8String.fromString(JsonObjectOps.compact(on))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(obj = newChildren(0), key = newChildren(1), value = newChildren(2))
}

/** `variant_list_insert(list, pos, value)` / `variant_list_insert(list, value)`
  * → utf8 JSON array. 3-arg form inserts at `pos` (clamped to [0, size]);
  * 2-arg form appends. Errors on non-array input.
  */
case class JsonListInsert(list: Expression, pos: Option[Expression],
    value: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(list) ++ pos.toSeq :+ value
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val l = list.eval(input)
    if (l == null) return null
    val node = JsonObjectOps.parse(
      JsonObjectOps.fragment(l, list.dataType) match {
        case s if s.startsWith("[") => s
        case other => throw new IllegalArgumentException(
          s"variant_list_insert: input is not a JSON array: $other")
      }, "variant_list_insert")
    val an = node.asInstanceOf[ArrayNode]
    val frag = JsonObjectOps.fragment(value.eval(input), value.dataType)
    val vn = JsonObjectOps.parse(frag, "variant_list_insert value")
    pos.map(_.eval(input)) match {
      case Some(null) => return null
      case Some(p) =>
        val idx = math.max(0, math.min(an.size(), p.asInstanceOf[Number].intValue()))
        an.insert(idx, vn)
      case None => an.add(vn)
    }
    UTF8String.fromString(JsonObjectOps.compact(an))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    if (pos.isDefined)
      copy(list = newChildren(0), pos = Some(newChildren(1)), value = newChildren(2))
    else copy(list = newChildren(0), value = newChildren(1))
}
