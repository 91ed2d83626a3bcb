package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{F, Intervals}

/** Pins the PG-parity function library against the reference engine's own
  * test vectors (captured from real Postgres 16 —
  * /root/reference/src/functions.rs:1557-1596) plus the JSON sniff-rule
  * vectors (:1606-1680).
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oneString(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.as("s")).collect()(0).getString(0)

  private val ts = lit("2026-06-10 08:10:52.422355").cast("timestamp_ntz")

  test("to_char matches Postgres 16 vectors") {
    val cases = Seq(
      "YYYY-MM-DD" -> "2026-06-10",
      "YYYY-MM-DD HH24:MI:SS" -> "2026-06-10 08:10:52",
      "YYYY-MM-DD\"T\"HH24:MI:SS.US\"Z\"" -> "2026-06-10T08:10:52.422355Z",
      "YYYY-MM-DD\"T\"HH24:MI:SS.MS\"Z\"" -> "2026-06-10T08:10:52.422Z",
      "DD/MM/YYYY" -> "10/06/2026",
      "Mon DD, YYYY" -> "Jun 10, 2026",
      "Day, Mon DD YYYY" -> "Wednesday, Jun 10 2026",
      "HH12:MI" -> "08:10",
      "YY" -> "26",
      "\"YYYY=\" YYYY" -> "YYYY= 2026",
      "\"· \"YYYY" -> "· 2026",
      "HH12:MI AM" -> "08:10 AM",
      "HH:MI:SS" -> "08:10:52", // bare HH aliases HH12
      "HH12:MI am" -> "08:10 am",
      "Dy" -> "Wed",
      "D" -> "4", // 2026-06-10 is a Wednesday; PG D is Sun=1
      "DY" -> "WED",
      "DY-D" -> "WED-4"
    )
    cases.foreach { case (fmt, expected) =>
      assert(oneString(F.to_char(ts, fmt)) == expected, s"format `$fmt`")
    }
    val pm = lit("2026-06-10 20:10:52").cast("timestamp_ntz")
    assert(oneString(F.to_char(pm, "HH12:MI PM")) == "08:10 PM")
  }

  test("interval parsing accepts both '5 minutes' and '5m' forms") {
    assert(Intervals.parseToMicros("5 minutes") == 300000000L)
    assert(Intervals.parseToMicros("5m") == 300000000L)
    assert(Intervals.parseToMicros("2 hours") == 7200000000L)
    assert(Intervals.parseToMicros("1 week") == 604800000000L)
    assert(Intervals.parseToMicros("30s") == 30000000L)
    intercept[IllegalArgumentException](Intervals.parseToMicros("five minutes"))
    intercept[IllegalArgumentException](Intervals.parseToMicros("5 fortnights"))
  }

  test("time_bucket floors to epoch-aligned boundaries") {
    val got = oneString(F.time_bucket("5 minutes", ts).cast("string"))
    assert(got == "2026-06-10 08:10:00")
    val got2 = oneString(F.time_bucket("1 hour",
      lit("2024-01-01 00:59:59.999999").cast("timestamp_ntz")).cast("string"))
    assert(got2 == "2024-01-01 00:00:00")
  }

  test("json_build_array: sniff at top level, never inside lists") {
    // reference functions.rs:1609-1630 (to_jsonb list/scalar vectors)
    assert(oneString(F.to_jsonb(
      array(lit("{\"a\":1}"), lit("[1,2]"), lit("plain"), lit("123")))) ==
      """["{\"a\":1}","[1,2]","plain","123"]""")
    assert(oneString(F.to_jsonb(lit("{\"a\":1}"))) == """{"a":1}""")
    // reference functions.rs:1676-1679 (mixed scalar broadcast)
    assert(oneString(F.json_build_array(lit("tag"), lit("id-7"), lit(7))) ==
      """["tag","id-7",7]""")
    // malformed sniff candidates fall back to JSON strings
    assert(oneString(F.json_build_array(lit("{not json}"))) ==
      """["{not json}"]""")
    // null renders as JSON null
    assert(oneString(F.json_build_array(lit(null).cast("string"), lit(1))) ==
      "[null,1]")
    // whole-minute timestamp still renders seconds (chrono to_rfc3339 parity,
    // reference functions.rs:1018)
    assert(oneString(F.json_build_array(
      lit("2026-06-10 08:00:00").cast("timestamp_ntz"))) ==
      """["2026-06-10T08:00:00+00:00"]""")
    assert(oneString(F.json_build_array(
      lit("2026-06-10 08:00:00.5").cast("timestamp_ntz"))) ==
      """["2026-06-10T08:00:00.500+00:00"]""")
  }

  test("variant_text implements PG ->> semantics") {
    val v = parse_json(lit("""{"s":"Alice","n":42,"f":1.5,"b":true,"z":null,"o":{"k":1},"a":[1,2]}"""))
    def leaf(path: String) = F.jsonb_path_text(v, path)
    val row = spark.range(1).select(
      leaf("s").as("s"), leaf("n").as("n"), leaf("f").as("f"),
      leaf("b").as("b"), leaf("z").as("z"), leaf("o").as("o"),
      leaf("a").as("a"), leaf("missing").as("m")).collect()(0)
    assert(row.getString(0) == "Alice")
    assert(row.getString(1) == "42")
    assert(row.getString(2) == "1.5")
    assert(row.getString(3) == "true")
    assert(row.isNullAt(4), "JSON null must surface as SQL NULL")
    assert(row.getString(5) == """{"k":1}""")
    assert(row.getString(6) == "[1,2]")
    assert(row.isNullAt(7), "missing path must be SQL NULL")
  }

  test("jsonb_path_exists: JSON-null key exists, missing key does not") {
    val v = parse_json(lit("""{"z":null,"k":1}"""))
    val row = spark.range(1).select(
      F.jsonb_path_exists(v, "z").as("z"),
      F.jsonb_path_exists(v, "k").as("k"),
      F.jsonb_path_exists(v, "nope").as("n")).collect()(0)
    assert(row.getBoolean(0), "key with JSON null value exists")
    assert(row.getBoolean(1))
    assert(!row.getBoolean(2))
  }

  test("jsonb_path_exists filter predicates follow PG lax semantics") {
    F.registerAll(spark)
    def check(json: String, path: String, expect: Boolean): Unit = {
      val got = spark.sql(
        s"SELECT jsonb_path_exists(parse_json('${json.replace("'", "''")}'), '$path') AS r")
        .head().getBoolean(0)
      assert(got == expect, s"$path over $json: got $got, want $expect")
    }
    val items = """{"items":[{"price":3},{"price":7,"qty":1},{"price":9}]}"""
    check(items, "$.items[*] ? (@.price > 5)", true)
    check(items, "$.items[*] ? (@.price > 9)", false)
    check(items, "$.items[*] ? (@.price >= 9)", true)
    check(items, "$.items[*] ? (@.price == 7 && @.qty == 1)", true)
    check(items, "$.items[*] ? (@.price == 7 && @.qty == 2)", false)
    check(items, "$.items[*] ? (@.price == 3 || @.qty == 1)", true)
    check(items, "$.items[*] ? (exists(@.qty))", true)
    check(items, "$.items[*] ? (exists(@.missing))", false)
    // trailing segment after the wildcard folds into the predicate
    check(items, "$.items[*].price ? (@ > 8)", true)
    // lax auto-wrap: non-array base treated as singleton
    check("""{"items":{"price":7}}""", "$.items[*] ? (@.price > 5)", true)
    // lax auto-unwrap: filter over an array base without [*]
    check("""{"a":[3,6]}""", "$.a ? (@ > 5)", true)
    check("""{"a":[3,4]}""", "$.a ? (@ > 5)", false)
    // string compares only match strings (no "5" == 5 coercion)
    check("""{"tags":["a","b"]}""", """$.tags[*] ? (@ == "a")""", true)
    check("""{"tags":["a","b"]}""", """$.tags[*] ? (@ == "c")""", false)
    check("""{"tags":[5]}""", """$.tags[*] ? (@ == "5")""", false)
    check("""{"tags":["5"]}""", "$.tags[*] ? (@ == 5)", false)
    check("""{"tags":[5]}""", "$.tags[*] ? (@ == 5)", true)
    // null literal distinguishes JSON null from missing
    check("""{"xs":[{"v":null}]}""", "$.xs[*] ? (@.v == null)", true)
    check("""{"xs":[{"w":1}]}""", "$.xs[*] ? (@.v == null)", false)
    check("""{"xs":[{"v":1}]}""", "$.xs[*] ? (@.v != null)", true)
    // boolean literal + root-object predicate (the monoscope prod shape)
    check("""{"ok":true}""", "$ ? (@.ok == true)", true)
    check("""{"k":69}""", "$ ? (@.k > 50)", true)
    check("""{"k":30}""", "$ ? (@.k > 50)", false)
    // data-type mismatch is an empty match, not an error (lax)
    check("""{"items":"not-an-object"}""", "$.items[*] ? (@.price > 5)", false)
  }

  test("SQL registration exposes reference names") {
    F.registerAll(spark)
    val df = spark.sql(
      """SELECT time_bucket('15 minutes', TIMESTAMP_NTZ '2024-03-01 10:37:11') AS b,
        |       to_char(TIMESTAMP_NTZ '2024-03-01 10:37:11', 'Mon DD, YYYY') AS c,
        |       extract_epoch(TIMESTAMP_NTZ '2024-03-01 10:37:11') AS e,
        |       text_match('Hello Spark World', 'spark hello') AS m,
        |       json_build_array('a', 1) AS j
        |""".stripMargin)
    val r = df.collect()(0)
    assert(r.getAs[java.time.LocalDateTime]("b").toString == "2024-03-01T10:30")
    assert(r.getAs[String]("c") == "Mar 01, 2024")
    assert(r.getAs[Double]("e") == 1.709289431e9)
    assert(r.getAs[Boolean]("m"))
    assert(r.getAs[String]("j") == """["a",1]""")
  }

  test("pg_settings view, set_config no-op, and the frozen test clock") {
    F.registerAll(spark)
    assert(spark.sql("SELECT count(*) FROM pg_settings").head().getLong(0) > 0)
    assert(spark.sql("SELECT set_config('a.b', 'v', false)").head().getString(0) == "v")
    assert(spark.sql("SELECT current_setting('spark.sql.session.timeZone')")
      .head().getString(0) == "UTC")
    // live view: a SET issued after registerAll shows up in pg_settings
    spark.sql("SET graft.test.live = yes")
    assert(spark.sql(
      "SELECT setting FROM pg_settings WHERE name = 'graft.test.live'")
      .head().getString(0) == "yes", "pg_settings must read live session state")
    try {
      spark.sql("SELECT timefusion_set_clock(1000000)").collect()
      assert(spark.sql("SELECT timefusion_now_micros()").head().getLong(0) == 1000000L)
      spark.sql("SELECT timefusion_advance_clock(500)").collect()
      assert(spark.sql("SELECT timefusion_now_micros()").head().getLong(0) == 1000500L)
      // reference signature: rfc3339 Utf8 argument (src/functions.rs:498-516)
      spark.sql("SELECT timefusion_set_clock('2024-01-01T00:00:10Z')").collect()
      assert(spark.sql("SELECT timefusion_now_micros()").head().getLong(0)
        == 1704067210000000L)
    } finally graft.functions.GraftClock.reset()
  }

  test("variant constructor family: construct, insert, cast") {
    F.registerAll(spark)
    def s(sql: String): String =
      spark.sql(s"SELECT cast(($sql) as string) AS r").head().getString(0)

    // object construct: PG value rendering, duplicate key last-wins in place
    assert(s("variant_object_construct('a', 1, 'b', 'x')").replace(" ", "")
      == """{"a":1,"b":"x"}""")
    assert(s("variant_object_construct('a', 1, 'a', 2)").replace(" ", "")
      == """{"a":2}""")
    // nested: a JSON-looking string value embeds as JSON (sniff rule)
    assert(s("""variant_object_construct('o', '{"k":true}')""").replace(" ", "")
      == """{"o":{"k":true}}""")

    // list construct + inserts (append / positional clamp)
    assert(s("variant_list_construct(1, 'a', null)").replace(" ", "")
      == """[1,"a",null]""")
    assert(s("variant_list_insert(variant_list_construct(1, 2), 3)")
      .replace(" ", "") == "[1,2,3]")
    assert(s("variant_list_insert(variant_list_construct(1, 2), 0, 99)")
      .replace(" ", "") == "[99,1,2]")
    assert(s("variant_list_insert(variant_list_construct(1, 2), 100, 99)")
      .replace(" ", "") == "[1,2,99]")

    // object insert: upsert, replaced key keeps position; works on Variant
    // and on JSON-text input alike
    assert(s("variant_object_insert(variant_object_construct('a', 1), 'b', 2)")
      .replace(" ", "") == """{"a":1,"b":2}""")
    assert(s("variant_object_insert(variant_object_construct('a', 1, 'b', 2), 'a', 9)")
      .replace(" ", "") == """{"a":9,"b":2}""")
    assert(s("""variant_object_insert('{"a":1}', 'b', variant_list_construct(1))""")
      .replace(" ", "") == """{"a":1,"b":[1]}""")

    // results are true Variants: path access works directly
    assert(spark.sql(
      """SELECT variant_get(variant_object_construct('a', 'x.y[0]'), 'a', 'string') AS r""")
      .head().getString(0) == "x.y[0]")
    // cast_to_variant: scalars lift, JSON-looking strings parse (the
    // engine's Utf8→Variant INSERT coercion)
    assert(s("cast_to_variant(42)") == "42")
    assert(spark.sql(
      """SELECT variant_get(cast_to_variant('[5,6]'), '$[1]', 'int') AS r""")
      .head().getInt(0) == 6)
    // non-object / non-array inputs error clearly
    val e = intercept[Exception](s("variant_object_insert('[1]', 'k', 1)"))
    assert(e.getMessage.contains("not a JSON object")
      || e.getCause != null && e.getCause.getMessage.contains("not a JSON object"))
  }

  test("at_time_zone shifts instant to wall-clock") {
    val got = oneString(F.at_time_zone(
      lit("2024-01-01 00:00:00").cast("timestamp_ntz"), "Asia/Kolkata")
      .cast("string"))
    assert(got == "2024-01-01 05:30:00")
  }

  test("misra_gries keeps every guaranteed-heavy item under eviction+merge") {
    import graft.functions.MisraGries.misra_gries
    // skewed stream far over capacity: 2 heavy items + a 200-item tail;
    // capacity 8 → guarantee bound N/9, heavies are well above it
    val tail = (0 until 200).flatMap(i => Seq.fill(2)(s"t$i"))
    val items = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++ tail
    val n = items.size // 1200
    // repartition(7) forces partial sketches + the mergeable-summaries path
    val sk = items.toDF("tok").repartition(7)
      .agg(misra_gries(col("tok"), 8).as("sk"))
      .head().getMap[String, Long](0)
    assert(sk.size <= 8, s"sketch exceeded capacity: ${sk.size}")
    val bound = n / 9.0
    for (h <- Seq("h1" -> 500L, "h2" -> 300L)) {
      assert(sk.contains(h._1), s"${h._1} (count ${h._2} > $bound) evicted")
      val kept = sk(h._1)
      assert(kept <= h._2 && kept >= h._2 - bound,
        s"${h._1} kept count $kept outside [${h._2 - bound}, ${h._2}]")
    }
    // two-pass operator: EXACT output equals brute-force truth
    val docs = items.grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
    val got = graft.operators.TextAnalysis
      .heavyHitters(docs, "text", minShare = 0.2, sketchSize = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("h1" -> 500L, "h2" -> 300L), s"exact pass got $got")
  }
}
