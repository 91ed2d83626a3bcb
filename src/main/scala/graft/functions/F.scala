package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** The PG-parity / time-series function library (SURVEY.md §2.8).
  *
  * Everything here composes Spark's codegen'd built-ins wherever possible;
  * only the PG-JSON renderers are interpreted expressions. `registerAll`
  * exposes the library under its reference SQL names so `spark.sql(…)`
  * queries run unchanged.
  */
object F {

  /** TimescaleDB-style `time_bucket(width, ts)` — epoch-aligned floor, the
    * reference engine's semantics (`/root/reference/src/functions.rs:1087-1092`;
    * it truncates `ts/size` which equals floor for post-1970 data — we use
    * true floor so pre-epoch timestamps bucket downward consistently).
    * Output is timestamp_ntz (all engine timestamps are UTC wall-clock).
    */
  def time_bucket(width: String, ts: Column): Column = {
    val w = Intervals.parseToMicros(width)
    val us = unix_micros(ts.cast("timestamp"))
    timestamp_micros(us - pmod(us, lit(w))).cast("timestamp_ntz")
  }

  /** PG `to_char(ts, fmt)` — see [[ToChar]]. */
  def to_char(ts: Column, fmt: String): Column = ToChar.toChar(ts, fmt)

  /** PG `EXTRACT(EPOCH FROM ts)`: seconds as double, sub-second preserved
    * (`/root/reference/src/functions.rs:939-967`). */
  def extract_epoch(ts: Column): Column =
    unix_micros(ts.cast("timestamp")).cast("double") / lit(1e6)

  /** PG `ts AT TIME ZONE tz` for UTC-stored timestamps: shift the instant so
    * the naive rendering shows local wall-clock time
    * (`/root/reference/src/functions.rs:777-818`). */
  def at_time_zone(ts: Column, tz: String): Column =
    from_utc_timestamp(ts.cast("timestamp"), tz).cast("timestamp_ntz")

  /** Case-insensitive all-tokens-substring match — the reference's
    * correctness-fallback full-text predicate
    * (`/root/reference/src/tantivy_index/udf.rs`). Compiles to a codegen'd
    * conjunction of `contains`. */
  def text_match(c: Column, query: String): Column = {
    val toks = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) lit(true)
    else toks.map(t => col2(lower(c)).contains(lit(t))).reduce(_ && _)
  }
  private def col2(c: Column): Column = c // keep explicit for readability

  /** PG `json_build_array(args…)` (and `jsonb_build_array`). */
  def json_build_array(cols: Column*): Column =
    ColumnBridge.column(JsonBuildArray(cols.map(ColumnBridge.expression)))

  /** PG `to_jsonb(x)` / scalar `to_json(x)` with the JSON-sniff rules. */
  def to_jsonb(c: Column): Column =
    ColumnBridge.column(ToJsonb(ColumnBridge.expression(c)))

  /** PG `->>` leaf semantics on a Variant value
    * (`/root/reference/src/functions.rs:256-264`): JSON null → SQL NULL,
    * strings unquoted, numbers/bools literal text, objects/arrays as
    * compact JSON text. */
  def variant_text(v: Column): Column = {
    when(v.isNull || is_variant_null(v), lit(null).cast("string"))
      .when(schema_of_variant(v) === lit("STRING"), variant_get(v, "$", "string"))
      .otherwise(to_json(v))
  }

  /** `v -> path ->> leaf` in one call: extract `path` (e.g. `a.b[0]`) from a
    * variant column and render with PG text semantics. */
  def jsonb_path_text(v: Column, path: String): Column =
    variant_text(try_variant_get(v, normalizePath(path), "variant"))

  /** `jsonb_path_exists(v, '$.a.b[0]')` for simple (non-filter) paths: a key
    * present with JSON-null value still exists, matching PG lax mode. */
  def jsonb_path_exists(v: Column, path: String): Column =
    try_variant_get(v, normalizePath(path), "variant").isNotNull

  private def normalizePath(path: String): String =
    if (path.startsWith("$")) path else "$." + path

  // ---------------------------------------------------------------- SQL --

  /** Register the library under its reference SQL names. Formats, interval
    * widths and match queries must be foldable string literals (true of
    * every reference query shape).
    *
    * Implementation note: registry builders must return plain Catalyst trees
    * (a Column-API tree wraps opaque `ColumnNodeExpression`s that never
    * resolve inside an already-running analysis), so each function is a SQL
    * template parsed by the session parser with the caller's argument
    * expressions spliced in for `__aN` placeholders.
    */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val registry = spark.sessionState.functionRegistry
    val parser = spark.sessionState.sqlParser

    def reg(name: String)(builder: Seq[Expression] => Expression): Unit =
      registry.createOrReplaceTempFunction(name, builder, "built-in")

    def template(sql: String, args: Seq[Expression]): Expression =
      parser.parseExpression(sql).transformUp {
        case a: UnresolvedAttribute if a.name.startsWith("__a") =>
          args(a.name.drop(3).toInt)
      }

    def litString(e: Expression, fn: String, arg: String): String = e match {
      case Literal(s: UTF8String, _) => s.toString
      case other if other.foldable =>
        String.valueOf(other.eval(null) match {
          case u: UTF8String => u.toString
          case x => x
        })
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal")
    }
    def sq(s: String): String = s.replace("'", "''")

    reg("time_bucket") { args =>
      val w = Intervals.parseToMicros(litString(args(0), "time_bucket", "width"))
      template(
        s"""cast(timestamp_micros(unix_micros(cast(__a1 as timestamp))
           |  - pmod(unix_micros(cast(__a1 as timestamp)), ${w}L)) as timestamp_ntz)""".stripMargin,
        args)
    }
    reg("to_char") { args =>
      val fmt = litString(args(1), "to_char", "format")
      template(ToChar.toSqlTemplate(fmt, "cast(__a0 as timestamp_ntz)"), args)
    }
    reg("extract_epoch") { args =>
      template("cast(unix_micros(cast(__a0 as timestamp)) as double) / 1e6", args)
    }
    reg("at_time_zone") { args =>
      val tz = litString(args(1), "at_time_zone", "tz")
      template(
        s"cast(from_utc_timestamp(cast(__a0 as timestamp), '${sq(tz)}') as timestamp_ntz)",
        args)
    }
    reg("text_match") { args =>
      val toks = litString(args(1), "text_match", "query")
        .toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Literal(true)
      else template(
        // cast: Variant input decodes to its JSON text (reference fix for
        // text_match over Variant columns, variant_column.slt)
        toks.map(t => s"contains(lower(cast(__a0 as string)), '${sq(t)}')")
          .mkString(" AND "),
        args)
    }
    reg("json_build_array") { args => JsonBuildArray(args) }
    reg("jsonb_build_array") { args => JsonBuildArray(args) }
    reg("to_jsonb") { args => ToJsonb(args.head) }
    // PG to_json (scalar/array, sniff rules) shadows Spark's struct-centric
    // built-in under this name — reference F6 semantics win in SQL
    reg("to_json") { args => ToJsonb(args.head) }
    reg("percentile_agg") { args =>
      PercentileAggSketch(org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, org.apache.spark.sql.types.DoubleType))
    }
    // reference shape: approx_percentile(p, percentile_agg(x)); Spark's
    // built-in stays available as percentile_approx
    reg("approx_percentile") { args =>
      ApproxPercentileFromDigest(org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), org.apache.spark.sql.types.DoubleType), args(1))
    }

    // datafusion-functions-json parity (F10/F11, reference
    // tests/slt/json_functions.slt): length/containment over JSON text and
    // the array-elements generator the reference only stubs
    // (src/functions.rs:820-827) — Spark's explode makes it a real function.
    reg("json_length") { args =>
      if (args.length == 1)
        template(
          "coalesce(json_array_length(__a0), size(json_object_keys(__a0)))",
          args)
      else {
        val p = litString(args(1), "json_length", "path")
        val path = if (p.startsWith("$")) p else "$." + p
        template(
          s"""coalesce(json_array_length(get_json_object(__a0, '${sq(path)}')),
             |  size(json_object_keys(get_json_object(__a0, '${sq(path)}'))))""".stripMargin,
          args)
      }
    }
    reg("json_contains") { args =>
      template("array_contains(json_object_keys(__a0), __a1)", args)
    }
    reg("json_get_str") { args =>
      val p = litString(args(1), "json_get_str", "path")
      val path = if (p.startsWith("$")) p else "$." + p
      template(s"get_json_object(__a0, '${sq(path)}')", args)
    }
    reg("json_array_elements") { args =>
      template("explode(from_json(__a0, 'array<string>'))", args)
    }
    reg("jsonb_array_elements") { args =>
      template("explode(from_json(__a0, 'array<string>'))", args)
    }

    def variantTextSql(v: String): String =
      s"""CASE WHEN $v IS NULL OR is_variant_null($v) THEN CAST(NULL AS STRING)
         |  WHEN schema_of_variant($v) = 'STRING' THEN variant_get($v, '$$', 'string')
         |  ELSE to_json($v) END""".stripMargin
    reg("variant_text") { args => template(variantTextSql("__a0"), args) }
    reg("jsonb_path_text") { args =>
      val p = normalizePath(litString(args(1), "jsonb_path_text", "path"))
      template(
        variantTextSql(s"try_variant_get(__a0, '${sq(p)}', 'variant')"), args)
    }
    // Accepts Variant OR json-text input (reference jsonb_path_exists does
    // both, src/functions.rs:1273-1502): variant→string cast yields JSON
    // text, re-parsed to variant — a no-op semantically, and it makes one
    // template serve both types. One `[*]` wildcard level is supported (the
    // lax-path shapes the slt corpus exercises).
    reg("jsonb_path_exists") { args =>
      val raw = litString(args(1), "jsonb_path_exists", "path")
      val p = normalizePath(raw)
      val v = "try_parse_json(cast(__a0 as string))"
      JsonPath.filterExistsSql(v, p) match {
        case Some(sql) => template(sql, args)
        case None => simplePathExists(p, v, args)
      }
    }
    def simplePathExists(p: String, v: String, args: Seq[Expression]): Expression = {
      if (p.contains("[*]")) {
        val Array(pre, post) = p.split("\\[\\*\\]", 2)
        val arr = s"try_variant_get($v, '${sq(if (pre.isEmpty) "$" else pre)}', 'array<variant>')"
        if (post.isEmpty)
          template(s"coalesce(size($arr) > 0, false)", args)
        else
          template(
            s"coalesce(exists($arr, x -> try_variant_get(x, '$$${sq(post)}', 'variant') IS NOT NULL), false)",
            args)
      } else
        template(s"try_variant_get($v, '${sq(p)}', 'variant') IS NOT NULL", args)
    }

    // --- reference variant UDF family (F8) under its SQL names -----------
    reg("json_to_variant") { args => template("parse_json(__a0)", args) }
    reg("variant_to_json") { args => VariantToJson(args.head) }
    reg("variant_pretty") { args =>
      // arrow-rust debug rendering; integers narrow to the smallest width,
      // matching datafusion-variant's parser (only shape the corpus pins)
      val v = "variant_get(__a0, '$', 'bigint')"
      template(
        s"""CASE WHEN schema_of_variant(__a0) = 'BIGINT' THEN
           |  CASE WHEN $v BETWEEN -128 AND 127 THEN concat('Int8(', cast($v as string), ')')
           |       WHEN $v BETWEEN -32768 AND 32767 THEN concat('Int16(', cast($v as string), ')')
           |       WHEN $v BETWEEN -2147483648 AND 2147483647 THEN concat('Int32(', cast($v as string), ')')
           |       ELSE concat('Int64(', cast($v as string), ')') END
           |ELSE to_json(__a0) END""".stripMargin, args)
    }
    // reference variant_get takes bare paths ('a.b[0]') and returns Variant;
    // the 3-arg typed form keeps Spark-builtin behavior. Built as the
    // Catalyst expression directly — a SQL template would resolve back into
    // this very registration.
    reg("variant_get") { args =>
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.catalyst.expressions.variant.{ParseJson, VariantGet}
      val p = normalizePath(litString(args(1), "variant_get", "path"))
      val target =
        if (args.length >= 3)
          org.apache.spark.sql.types.DataType.fromDDL(
            litString(args(2), "variant_get", "type"))
        else org.apache.spark.sql.types.VariantType
      // accept json-text input too (arrow-chain slices): variant→string→
      // parse is a semantic no-op, string input parses to variant
      val v =
        if (args(0).resolved &&
          args(0).dataType == org.apache.spark.sql.types.VariantType) args(0)
        else ParseJson(Cast(args(0),
          org.apache.spark.sql.types.StringType), failOnError = false)
      VariantGet(v,
        Literal(UTF8String.fromString(p),
          org.apache.spark.sql.types.StringType),
        target, failOnError = false)
    }

    // Constructor family (reference registers datafusion-variant's
    // VariantObjectConstruct/Insert + VariantListConstruct/Insert +
    // CastToVariantUdf, src/functions.rs:443-450; its corpus never pins
    // them, so semantics follow the PG/Snowflake conventions the names come
    // from — see JsonObjectOps). Builders render JSON text with the PgJson
    // rules, then parse_json lifts to a true Variant.
    def parseJson(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.variant.ParseJson(e)
    reg("variant_object_construct") { args => parseJson(JsonBuildObject(args)) }
    reg("variant_list_construct") { args => parseJson(JsonBuildArray(args)) }
    reg("variant_object_insert") { args =>
      parseJson(JsonObjectInsert(args(0), args(1), args(2)))
    }
    reg("variant_list_insert") { args =>
      parseJson(JsonListInsert(args(0),
        if (args.length >= 3) Some(args(1)) else None, args.last))
    }
    // string inputs that look like JSON parse as JSON — the same coercion
    // the engine applies on Utf8→Variant INSERT (utf8_to_variant,
    // reference src/database.rs:1618); other scalars lift to the
    // corresponding variant scalar
    reg("cast_to_variant") { args => parseJson(ToJsonb(args.head)) }

    // --- gateway operator targets (SltRunner dialect rewrites) -----------
    // a -> 'k'  /  a ->> 0   (datafusion-functions-json slice semantics)
    reg("pg_arrow") { args =>
      JsonArrow(args(0), args(1), isIndex = isIndexKey(args(1)), text = false)
    }
    reg("pg_arrow_text") { args =>
      JsonArrow(args(0), args(1), isIndex = isIndexKey(args(1)), text = true)
    }
    // PG a @> b array containment. NB: no lambda here — `__aN`
    // placeholders inside a lambda body are captured by lambda-variable
    // resolution before the template splice can reach them.
    reg("pg_array_contains") { args =>
      template("size(array_except(__a1, __a0)) = 0", args)
    }
    reg("array_length") { args => template("size(__a0)", args) }

    // --- PG-client compat shims (S9/F14, reference src/database.rs:3283-3347):
    // set_config returns its value (engine-side no-op, like the reference);
    // current_setting reads the session conf; pg_settings is a view.
    reg("set_config") { args => args(1) }
    reg("current_setting") { args =>
      val name = litString(args(0), "current_setting", "name")
      Literal(UTF8String.fromString(
        spark.conf.getOption(name).getOrElse("")),
        org.apache.spark.sql.types.StringType)
    }
    // --- test clock (F15, reference src/functions.rs:498-535): frozen
    // virtual time for deterministic fixtures. Values resolve at analysis
    // time — the reference's UDFs are likewise test-harness-only.
    reg("timefusion_set_clock") { args =>
      // reference signature takes an rfc3339 Utf8 (src/functions.rs:498-516);
      // numeric micros accepted too for harness convenience
      val v = args.head.eval(null) match {
        case s: UTF8String =>
          val i = java.time.OffsetDateTime.parse(s.toString).toInstant
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"timefusion_set_clock: expected rfc3339 string or micros, got $other")
      }
      GraftClock.set(v)
      Literal(v, org.apache.spark.sql.types.LongType)
    }
    reg("timefusion_advance_clock") { args =>
      val v = args.head.eval(null).asInstanceOf[Number].longValue()
      Literal(GraftClock.advance(v), org.apache.spark.sql.types.LongType)
    }
    reg("timefusion_now_micros") { _ =>
      Literal(GraftClock.nowMicros, org.apache.spark.sql.types.LongType)
    }

    // pg_settings reads LIVE session state (reference src/database.rs:
    // 3283-3347 reads the catalog per query): the builder below runs at
    // ANALYSIS time on the driver (like current_setting) and embeds the
    // conf snapshot as a literal, and a SQL temp view stores its parsed
    // plan and re-analyzes per query — so every SELECT against the view
    // re-fires the builder and sees `SET`s issued after registerAll. The
    // snapshot is driver-state-only and O(#settings); nothing executes on
    // executors but a literal scan.
    reg("pg_settings_rows") { _ =>
      val rows = spark.conf.getAll.toSeq.sortBy(_._1).map { case (k, v) =>
        s"named_struct('name', '${sq(k)}', 'setting', '${sq(v)}')"
      }
      parser.parseExpression(s"array(${rows.mkString(",")})")
    }
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW pg_settings AS
      SELECT s.name, s.setting FROM (SELECT explode(pg_settings_rows()) AS s)""")
  }

  private def isIndexKey(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.StringType => false
    case _ => true
  }
}
