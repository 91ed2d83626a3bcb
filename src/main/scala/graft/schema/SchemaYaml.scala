package graft.schema

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Loader for the reference's schema YAML files
  * (`/root/reference/schemas/ yaml files`, grammar per
  * `/root/reference/src/schema_loader.rs:191-390`): table metadata
  * (partitions, dedup spec, sorting/z-order columns) plus a field list with
  * Arrow type names and per-field options (bloom_filter, dictionary,
  * tantivy).
  *
  * The files use a small regular subset of YAML — top-level scalars, string
  * lists, and lists of flat maps (inline `{…}` values are captured as raw
  * strings) — parsed here directly; no YAML dependency exists in this
  * environment and none is needed for this grammar.
  *
  * Type mapping follows SURVEY.md §1.2: `Utf8→string`, `Int32/UInt32→int`,
  * `Int64/UInt64→long`, `Float64→double`, `Boolean→boolean`, `Date32→date`,
  * `Timestamp(Microsecond, Some("UTC"))→timestamp_ntz` (engine timestamps
  * are naive UTC end-to-end), `List(T)→array<T>`, `Variant→variant`.
  */
object SchemaYaml {

  /** Per-field options beyond the Spark type (reference `FieldDef`). */
  case class FieldOptions(bloomFilter: Boolean = false,
    dictionaryDisabled: Boolean = false, tantivy: Option[String] = None)

  case class Loaded(table: TableSchema, fieldOptions: Map[String, FieldOptions],
    zOrderColumns: Seq[String])

  def load(path: String): Loaded =
    parse(Files.readString(Paths.get(path)))

  def parse(text: String): Loaded = {
    // strip comments and blank lines, keep indentation
    val lines = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .toVector

    val scalars = scala.collection.mutable.Map[String, String]()
    val lists = scala.collection.mutable.Map[String, Vector[String]]()
    val mapLists = scala.collection.mutable.Map[String, Vector[Map[String, String]]]()

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val key = line.takeWhile(_ != ':').trim
      val rest = line.dropWhile(_ != ':').drop(1).trim
      if (rest.nonEmpty) { // top-level scalar or inline empty list
        if (rest == "[]") lists(key) = Vector.empty
        else scalars(key) = unquote(rest)
        i += 1
      } else { // a list follows
        i += 1
        val plain = Vector.newBuilder[String]
        val maps = Vector.newBuilder[Map[String, String]]
        var isMapList = false
        while (i < lines.length && lines(i).trim.startsWith("-")) {
          val item = lines(i).trim.stripPrefix("-").trim
          if (item.startsWith("{") && item.endsWith("}")) {
            // inline flow map: "- { name: x, data_type: Utf8, … }"
            isMapList = true
            maps += splitFlow(item.substring(1, item.length - 1))
              .map(splitKv).toMap
            i += 1
          } else if (item.contains(":")) { // map entry: "- name: x" + indented keys
            isMapList = true
            val m = scala.collection.mutable.Map[String, String]()
            val (k0, v0) = splitKv(item)
            m(k0) = v0
            i += 1
            while (i < lines.length && !lines(i).trim.startsWith("-") &&
              lines(i).startsWith("    ") && lines(i).contains(":")) {
              val (k, v) = splitKv(lines(i).trim)
              m(k) = v
              i += 1
            }
            maps += m.toMap
          } else {
            plain += unquote(item)
            i += 1
          }
        }
        if (isMapList) mapLists(key) = maps.result()
        else lists(key) = plain.result()
      }
    }

    val fields = mapLists.getOrElse("fields", Vector.empty)
    val structFields = fields.map { f =>
      StructField(f("name"), toSparkType(f("data_type")),
        nullable = f.get("nullable").forall(_ == "true"))
    }
    val options = fields.map { f =>
      f("name") -> FieldOptions(
        bloomFilter = f.get("bloom_filter").contains("true"),
        dictionaryDisabled = f.get("dictionary").contains("false"),
        tantivy = f.get("tantivy"))
    }.toMap
    val sortKeys = mapLists.getOrElse("sorting_columns", Vector.empty).map { s =>
      SortKey(s("name"),
        descending = s.get("descending").contains("true"),
        nullsFirst = s.get("nulls_first").contains("true"))
    }

    Loaded(
      TableSchema(
        name = scalars("table_name"),
        schema = StructType(structFields),
        partitions = lists.getOrElse("partitions", Vector("project_id", "date")),
        timeColumn = scalars.getOrElse("time_column", "timestamp"),
        // no declared dedup_keys = an INSERT-ONLY table (variant_bench):
        // reads apply no version resolution — defaulting to (timestamp,
        // id) here would order a window by a tiebreak column the schema
        // does not even carry
        dedupKeys = lists.getOrElse("dedup_keys", Vector.empty),
        dedupTiebreak = scalars.getOrElse("dedup_tiebreak", "updated_at"),
        tombstoneColumn = scalars.get("tombstone_column"),
        versionAppend = scalars.get("version_append").contains("true"),
        sortingColumns = sortKeys,
        zOrderColumns = lists.getOrElse("z_order_columns", Vector.empty),
        bloomFilterColumns = fields.filter(f =>
          f.get("bloom_filter").contains("true")).map(_("name")),
        dictionaryDisabledColumns = fields.filter(f =>
          f.get("dictionary").contains("false")).map(_("name"))),
      options,
      lists.getOrElse("z_order_columns", Vector.empty))
  }

  private[schema] def toSparkType(t: String): DataType = t.trim match {
    case "Utf8" | "Utf8View" => StringType
    case "Int32" | "UInt32" => IntegerType
    case "Int64" | "UInt64" => LongType
    case "Float64" => DoubleType
    case "Float32" => FloatType
    case "Boolean" => BooleanType
    case "Date32" => DateType
    case "Variant" => VariantType
    case ts if ts.startsWith("Timestamp(") => TimestampNTZType
    case ls if ls.startsWith("List(") && ls.endsWith(")") =>
      ArrayType(toSparkType(ls.stripPrefix("List(").stripSuffix(")")))
    case other => throw new IllegalArgumentException(s"unmapped Arrow type: $other")
  }

  /** Split a flow-map body on commas outside quotes and parens. */
  private def splitFlow(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    var depth = 0
    var inS = false
    var inD = false
    s.foreach {
      case '\'' if !inD => inS = !inS; buf.append('\'')
      case '"' if !inS => inD = !inD; buf.append('"')
      case c @ ('(' | '{' | '[') if !inS && !inD => depth += 1; buf.append(c)
      case c @ (')' | '}' | ']') if !inS && !inD => depth -= 1; buf.append(c)
      case ',' if depth == 0 && !inS && !inD =>
        out += buf.toString.trim; buf.clear()
      case c => buf.append(c)
    }
    if (buf.nonEmpty) out += buf.toString.trim
    out.result()
  }

  private def splitKv(s: String): (String, String) = {
    // inline maps ("tantivy: { … }") keep the value raw
    val idx = s.indexOf(':')
    (s.substring(0, idx).trim, unquote(s.substring(idx + 1).trim))
  }

  private def stripComment(line: String): String = {
    var inS = false
    var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD => return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if ((s.startsWith("'") && s.endsWith("'") && s.length > 1) ||
      (s.startsWith("\"") && s.endsWith("\"") && s.length > 1))
      s.substring(1, s.length - 1)
    else s
}
