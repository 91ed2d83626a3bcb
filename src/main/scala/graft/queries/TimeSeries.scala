package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.F
import graft.tables.Tables

/** Time-series + PG-function coverage (SURVEY.md §2.8): `time_bucket`,
  * `to_char`, `extract_epoch`, `at_time_zone`, JSON string access, Variant
  * access, PG JSON builders, and the full-text fallback `text_match`.
  *
  * Oracle notes:
  *  - `time_bucket` is epoch-aligned floor, expressed in DuckDB as integer
  *    µs arithmetic (`make_timestamp((epoch_us(ts)//W)*W)`), NOT DuckDB's
  *    own `time_bucket` (whose origin is 2000-01-03);
  *  - `at_time_zone` is oracled with a fixed-offset zone (Asia/Kolkata,
  *    +05:30, no DST) so the oracle never depends on DuckDB's session TZ;
  *  - `json_build_array` output is compact, matching DuckDB `json_array`.
  */
object TimeSeries {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- F1: time_bucket ------------------------------------------------
    "q14_time_bucket" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") < lit("2024-01-08").cast("timestamp_ntz"))
        .groupBy(F.time_bucket("6 hours", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket")
    },

    // ---- F2: to_char PG tokens ------------------------------------------
    "q15_to_char" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(F.to_char(col("ts"), "YYYY-MM-DD").as("day"),
          F.to_char(col("ts"), "Dy").as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day")
    },

    // ---- F4: extract_epoch ----------------------------------------------
    "q16_extract_epoch" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 100)
        .select(col("event_id"), F.extract_epoch(col("ts")).as("epoch_s"))
        .orderBy("event_id")
    },

    // ---- F10: JSON-string access (get_json_object path) ------------------
    "q17_json_get" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("k_mod")
    },

    // ---- F8: Variant ingestion + typed variant_get -----------------------
    "q18_variant_get" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", variant_get(col("v"), "$.k", "long"))
        .filter(F.jsonb_path_exists(col("v"), "k"))
        .groupBy((col("k") % 7).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("k_mod")
    },

    // ---- F3: at_time_zone composed with to_char --------------------------
    "q19_at_time_zone" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(F.to_char(F.at_time_zone(col("ts"), "Asia/Kolkata"),
          "YYYY-MM-DD HH24").as("kolkata_hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy("kolkata_hour")
        .limit(48)
    },

    // ---- F5/F6: PG JSON builders -----------------------------------------
    "q20_json_build" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 50)
        .select(col("event_id"),
          F.json_build_array(col("event_type"), col("user_id"), col("props"))
            .as("arr"),
          F.to_jsonb(col("props")).as("obj"))
        .orderBy("event_id")
    },

    // ---- F12: text_match full-text fallback ------------------------------
    "q21_text_match" -> { (s, dir) =>
      Tables.documents(s, dir)
        .filter(F.text_match(col("text"), "spark merge window"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // ---- P6/P7: PG array operators (`&&` overlap / `@>` containment /
    // `= ANY`) over token arrays ------------------------------------------
    "q39_array_ops" -> { (s, dir) =>
      import graft.operators.TextDedup
      Tables.documents(s, dir)
        .withColumn("toks", TextDedup.tokenSet(col("text")))
        .select(
          arrays_overlap(col("toks"), array(lit("spark"), lit("merge")))
            .as("has_any"),
          (size(array_except(array(lit("the"), lit("of")), col("toks"))) === 0)
            .as("has_all"),
          array_contains(col("toks"), "window").as("eq_any"))
        .groupBy("has_any", "has_all", "eq_any")
        .agg(count(lit(1)).as("n"))
        .orderBy("has_any", "has_all", "eq_any")
    },

    // ---- F11: jsonb_array_elements (the reference stubs it; Spark's
    // explode makes it real) ----------------------------------------------
    "q40_json_elements" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 100)
        .withColumn("arr", format_string("""["%s","%s"]""", col("event_type"),
          get_json_object(col("props"), "$.k")))
        .select(col("event_id"),
          explode(from_json(col("arr"),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType))).as("elem"))
        .orderBy("event_id", "elem")
    },

    // ---- W7+: session windows (beyond the reference, which has none —
    // Spark's session_window comes free). Oracle replays the same
    // gap-merge semantics as gaps-and-islands SQL. --------------------------
    "q41_session_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // ---- as-of join (beyond the reference, which has no as-of operator —
    // SURVEY §2.3): each click enriched with the user's latest error at or
    // before it. Union+window implementation, oracled by DuckDB ASOF JOIN.
    "q72_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // right side must be unique per (key, ts): latest event_id wins
      val errs = ev.filter(col("event_type") === "error")
        .groupBy("user_id", "ts")
        .agg(max_by(col("value"), col("event_id")).as("err_value"))
      graft.operators.AsOfJoin.asOf(clicks, errs, Seq("user_id"), "ts",
          rightTsAs = Some("err_ts"))
        .orderBy("event_id")
    },

    // ---- ordered conversion funnel (product-analytics shape; beyond the
    // reference). First-touch anchored, 24h window, greedy-earliest steps.
    "q80_funnel" -> { (s, dir) =>
      graft.operators.Funnel.funnel(Tables.events(s, dir), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"), "24 HOUR")
        .orderBy("user_id")
    },

    // ---- gap-filled series with LOCF (time_bucket_gapfill + locf — the
    // dashboard "no holes in the chart" shape): every series densified to
    // its full hourly range, missing buckets carried forward. sequence()
    // explodes per-series bucket ranges (no cross join against a global
    // calendar), LOCF is one window pass.
    "q87_gapfill_locf" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .filter(col("user_id") < 10 &&
          col("ts") < lit("2024-01-08").cast("timestamp_ntz"))
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"))
        .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      val series = hourly.groupBy("user_id")
        .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        .select(col("user_id"), explode(sequence(col("b0"), col("b1"),
          expr("INTERVAL 1 HOUR"))).as("bucket"))
      val w = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      series.join(hourly, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), col("bucket"),
          (col("n").isNull).as("filled"),
          round(last(col("sum_value") / col("n"), ignoreNulls = true).over(w),
            6).as("value_locf"))
        .orderBy("user_id", "bucket")
    },

    // ---- gapfill with LINEAR interpolation (TimescaleDB `interpolate`,
    // the other half of the q87 LOCF family): an empty bucket takes the
    // line between its surrounding observed points; buckets before the
    // first / after the last observation stay null. Two bounded windows
    // per series carry the (epoch, value) of the nearest observed point
    // in each direction; identical double arithmetic on both engines →
    // oracle-exact. -------------------------------------------------------
    "q116_gapfill_interp" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .filter(col("user_id") < 10 &&
          col("ts") < lit("2024-01-08").cast("timestamp_ntz"))
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("bucket"))
        .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      val series = hourly.groupBy("user_id")
        .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        .select(col("user_id"), explode(sequence(col("b0"), col("b1"),
          expr("INTERVAL 1 HOUR"))).as("bucket"))
      val wb = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obs = when(col("v").isNotNull,
        struct(col("bus").as("b"), col("v").as("v")))
      series.join(hourly, Seq("user_id", "bucket"), "left")
        .withColumn("v", col("sum_value") / col("n"))
        .withColumn("bus", unix_micros(col("bucket").cast("timestamp")))
        .withColumn("p", last(obs, ignoreNulls = true).over(wb))
        .withColumn("nx", first(obs, ignoreNulls = true).over(wf))
        .select(col("user_id"), col("bucket"), col("n").isNull.as("filled"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("p").isNotNull && col("nx").isNotNull,
              col("p.v") + (col("nx.v") - col("p.v")) *
                ((col("bus") - col("p.b")).cast("double") /
                  (col("nx.b") - col("p.b")))), 6).as("value_interp"))
        .orderBy("user_id", "bucket")
    },

    // ---- time-weighted average (TimescaleDB toolkit's third pillar next
    // to time_bucket/percentile_agg): LOCF integral over each user's
    // observation span — irregular samples weighted by how long they held,
    // not how often they fired. One window pass + one aggregation.
    // ---- counter-reset-aware increase (PromQL increase() / TimescaleDB
    // counter_agg): a monotone counter that occasionally resets to zero
    // contributes its delta per consecutive sample, and a reset
    // (value < prev) contributes the post-reset value. One window per
    // series (shuffle keyed by series — parallel across the fleet's
    // series cardinality), deltas summed per (series, bucket) through
    // DECIMAL so Spark/DuckDB float summation order cannot diverge.
    "q101_counter_increase" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("__prev", lag(col("value"), 1).over(w))
        .withColumn("__inc",
          when(col("__prev").isNull, lit(0.0))
            .when(col("value") < col("__prev"), col("value"))
            .otherwise(col("value") - col("__prev")))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(sum(col("__inc").cast(DecimalType(18, 6))).cast("double")
          .as("increase"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "hour")
    },

    // ---- per-bucket linear trend (TimescaleDB stats_agg slope/intercept):
    // closed-form least squares from four sums, each routed through
    // DECIMAL so the only floating-point steps are per-row products and
    // the final division — deterministic on both engines regardless of
    // aggregation order. x is seconds into the bucket (bounded, so the
    // decimal sums cannot overflow at any row count that fits a bucket).
    "q102_bucket_trend" -> { (s, dir) =>
      val d = DecimalType(30, 8)
      val ev = Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("x",
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("day").cast("timestamp"))).cast("double") / 1e6)
      val sums = ev.groupBy(col("event_type"),
          col("day").cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x").cast(d)).cast("double").as("sx"),
          sum(col("value").cast(d)).cast("double").as("sy"),
          sum((col("x") * col("value")).cast(d)).cast("double").as("sxy"),
          sum((col("x") * col("x")).cast(d)).cast("double").as("sx2"))
      val den = col("n") * col("sx2") - col("sx") * col("sx")
      sums
        .withColumn("slope",
          when(den === 0, lit(null))
            .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy"))
              / den, 6)))
        .withColumn("intercept",
          when(den === 0, lit(null))
            .otherwise(round((col("sy") * col("sx2") - col("sx") * col("sxy"))
              / den, 6)))
        .select(col("event_type"), col("day"), col("n").cast("long").as("n"),
          col("slope"), col("intercept"))
        .orderBy("event_type", "day")
    },

    // ---- robust outlier counting (median/MAD): the alerting shape —
    // per series, how many points sit beyond k·MAD of the median. Two
    // grouped exact percentiles (one to fix the median, one over the
    // absolute deviations after a broadcast-size join back), comparisons
    // only afterwards — order-independent, so oracle-exact.
    "q103_outlier_mad" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("value") - col("med")))
      val stats = dev.groupBy("event_type")
        .agg(min(col("med")).as("med"),
          percentile(col("ad"), lit(0.5)).as("mad"),
          count(lit(1)).as("n"))
      val outliers = dev
        .join(broadcast(stats.select(col("event_type"), col("mad"))),
          "event_type")
        .filter(col("ad") > lit(3.0) * col("mad"))
        .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
      stats.join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), round(col("med"), 6).as("median"),
          round(col("mad"), 6).as("mad"), col("n"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    },

    "q86_time_weighted_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        // unix_micros rejects TIMESTAMP_NTZ; the session is UTC so the
        // cast is instant-preserving
        .withColumn("w_us",
          (unix_micros(col("next_ts").cast("timestamp")) -
            unix_micros(col("ts").cast("timestamp"))).cast("double"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          round(sum(col("value") * col("w_us")) / sum(col("w_us")), 6)
            .as("twa"))
        .orderBy("user_id")
    },

    // ---- distribution profile (data-quality monitoring shape): fixed-width
    // value histogram per event type plus range stats — one aggregation,
    // map-side combinable; the feature-distribution check training
    // pipelines run per ingest batch.
    "q82_value_histogram" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          least(floor(col("value") / 10.0), lit(9.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"))
        .orderBy("event_type", "bin")
    },

    // ---- cohort retention (product-analytics shape; beyond the reference):
    // users grouped by first-seen week, distinct-active counts per weekly
    // offset — one aggregation for the cohort anchor, one distinct-count
    // over (anchor ⋈ events); both shuffles key on user_id only.
    "q81_cohort_retention" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("timestamp_ntz").as("wk"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7)
            .cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // ---- histogram_quantile (PromQL / otel explicit-bucket histograms):
    // quantile estimation from cumulative le-bucket counts — the shape
    // every metrics backend serves when the raw samples are gone and only
    // bucketed counters remain. Fixed le bounds 10..90 + +Inf, cumulative
    // counts per (event_type, day), then Prometheus's interpolation rule:
    // the winning bucket is the lowest with cum >= q·total; the estimate
    // interpolates linearly inside [prev_le, le); a +Inf winner degrades
    // to the highest finite bound. All arithmetic is on integer counts and
    // literal bounds — order-independent, so oracle-exact. Scale: one
    // bounded aggregation (groups × ≤10 buckets) plus windows over ≤10-row
    // partitions; the raw scan is the only data-sized stage.
    "q106_histogram_quantile" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val q = 0.95
      val bucketed = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          when(col("value") >= 90.0, lit(Double.PositiveInfinity))
            .otherwise((floor(col("value") / 10.0) + 1) * 10.0).as("le"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type", "day").orderBy("le")
      val wAll = Window.partitionBy("event_type", "day")
      val cum = bucketed
        .withColumn("cum", sum(col("cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_le", lag(col("le"), 1, 0.0).over(w))
        .withColumn("prev_cum", lag(col("cum"), 1, 0L).over(w))
        .withColumn("total", sum(col("cnt")).over(wAll))
        .withColumn("max_finite",
          max(when(col("le") =!= Double.PositiveInfinity, col("le")))
            .over(wAll))
      val winner = cum
        .filter(col("cum") >= lit(q) * col("total"))
        .groupBy(col("event_type"), col("day"))
        .agg(min_by(
          struct(col("le"), col("prev_le"), col("prev_cum"), col("cum"),
            col("total"), col("max_finite")), col("le")).as("b"))
        .select(col("event_type"), col("day"), col("b.*"))
      winner
        .withColumn("p95",
          when(col("le") === Double.PositiveInfinity, col("max_finite"))
            .otherwise(round(col("prev_le") + (col("le") - col("prev_le")) *
              (lit(q) * col("total") - col("prev_cum")) /
              (col("cum") - col("prev_cum")), 6)))
        .select(col("event_type"), col("day"),
          col("total").cast("long").as("n"), col("p95"))
        .orderBy("event_type", "day")
    },

    // ---- binned range join (the "what happened near this event" overlap
    // join): for every error event, the click events within ±60 s across
    // ALL users. A naive inequality join is a broadcast-nested-loop — at
    // 100 TB a cartesian death sentence. The scale shape: quantize both
    // sides to 60 s grid cells, explode the PROBE side to its cell ±1
    // (each right row keeps exactly one cell, so a matched pair meets in
    // exactly one cell — no dedup pass), equi-join on the cell, and apply
    // the exact |Δt| predicate post-join. Shuffle keys on the grid cell;
    // AQE's skew split handles a hot minute.
    "q107_range_join_binned" -> { (s, dir) =>
      val winUs = 60L * 1000000L
      val ev = Tables.events(s, dir).withColumn("us",
        unix_micros(col("ts").cast("timestamp")))
      val cell = expr(s"us div ${winUs}L")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("us").as("e_us"),
          explode(sequence(cell - 1, cell + 1)).as("cell"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("us").as("c_us"),
          col("value").as("c_value"), cell.as("cell"))
      val hit = col("c_id").isNotNull &&
        abs(col("c_us") - col("e_us")) <= winUs
      errors.join(clicks, Seq("cell"), "left")
        .groupBy(col("event_id"))
        .agg(count(when(hit, lit(1))).as("n_nearby"),
          coalesce(sum(when(hit, col("c_value")).cast(DecimalType(18, 2))),
            lit(0).cast(DecimalType(18, 2))).cast("double").as("sum_nearby"))
        .orderBy("event_id")
    },

    // ---- per-series EWMA (the smoothing half of alerting / anomaly
    // scoring): exponentially-weighted moving average over each user's
    // value sequence, final smoothed level per series. The recursion
    // s_t = α·x_t + (1−α)·s_{t−1} has no order-independent closed form
    // that both engines evaluate identically, so BOTH sides run the same
    // left fold over the same ordered list — Spark's `aggregate` HOF over
    // a sort_array'd collect_list vs DuckDB's `list_reduce` over
    // `list(... ORDER BY)`; identical double ops in identical order are
    // bit-equal, making a sequential recursion oracle-exact. Scale: state
    // is one array per series, the same bound as sessionization; a 100 TB
    // deployment bounds the series by retention window first.
    "q108_ewma" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("series"))
        .select(col("user_id"), size(col("series")).cast("long").as("n"),
          round(aggregate(transform(col("series"), x => x("value")),
            lit(null).cast("double"),
            (acc, x) => when(acc.isNull, x)
              .otherwise(lit(0.25) * x + lit(0.75) * acc)), 6).as("ewma"))
        .orderBy("user_id")
    },

    // ---- multi-window SLO burn rate (the SRE-workbook alerting shape):
    // per hour, the error-rate over the hour AND over the trailing 6 h,
    // both expressed as burn of a 10% error budget; the alert fires only
    // when BOTH windows burn >1× — the standard fast+slow window guard
    // against blips and against slow-burn blindness. The corpus-sized
    // stage is ONE hourly count aggregation; the rolling window runs over
    // hourly aggregates (bounded by retention, not data size). Integer
    // counts until the final division — oracle-exact. -----------------------
    "q114_burn_rate" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 0.10
      val hourly = Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
          .as("hour"))
        .agg(count(lit(1)).as("n"),
          count(when(col("event_type") === "error", lit(1))).as("n_err"))
      val w6 = Window.orderBy("hour").rowsBetween(-5, 0)
      hourly
        .withColumn("n_6h", sum(col("n")).over(w6))
        .withColumn("n_err_6h", sum(col("n_err")).over(w6))
        .select(col("hour"), col("n"), col("n_err"),
          round((col("n_err") / col("n")) / budget, 6).as("burn_1h"),
          round((col("n_err_6h") / col("n_6h")) / budget, 6).as("burn_6h"))
        .withColumn("alert", col("burn_1h") > 1.0 && col("burn_6h") > 1.0)
        .orderBy("hour")
    },

    // ---- lag-24h autocorrelation of hourly volume (seasonality
    // detection — the "is this metric daily-periodic" question behind
    // seasonal baselines and anomaly suppression): Pearson r between the
    // hourly count series and itself shifted one day, per event type.
    // Deviations are doubles, so every product routes through DECIMAL
    // before summing (q102's rule: the only floating steps are per-row
    // arithmetic and the final division — order-independent on both
    // engines). The corpus-sized stage is the hourly aggregation; the
    // window/statistics run over retention-bounded hourly rows. -----------
    "q117_autocorrelation" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = DecimalType(30, 8)
      val lagHours = 24
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy("event_type")
      val wSeq = Window.partitionBy("event_type").orderBy("hour")
      val dev = hourly
        .withColumn("mean", avg(col("n")).over(wAll))
        .withColumn("dx", col("n") - col("mean"))
        .withColumn("dy", lead(col("dx"), lagHours).over(wSeq))
      dev.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_hours"),
          (sum(when(col("dy").isNotNull, col("dx") * col("dy")).cast(d))
            .cast("double") /
            sum((col("dx") * col("dx")).cast(d)).cast("double")).as("r_raw"))
        .select(col("event_type"), col("n_hours"),
          round(col("r_raw"), 6).as("acf_24h"))
        .orderBy("event_type")
    },

    // ---- CUSUM change-point detection (drift alerting): the one-sided
    // cumulative-sum recursion s_t = max(0, s_{t-1} + x_t − μ − k) over
    // each series' hourly means, with the running max and the count of
    // hours in alarm (s > h) carried in the SAME fold. Like q108, both
    // engines run the identical left fold in the identical order — here
    // with STRUCT state (level, max, alarms), proving the technique
    // extends beyond scalar recursions: Spark `aggregate` takes the
    // struct zero directly; DuckDB's `list_reduce` seeds from the first
    // element, so the oracle maps elements to structs and prepends the
    // zero. μ is the series' DECIMAL-routed mean; k and h are literals;
    // s' is written out three times (no let-binding in SQL lambdas) with
    // identical arithmetic, so the folds stay bit-equal. ------------------
    "q118_cusum" -> { (s, dir) =>
      val k = 2.0
      val h = 8.0
      val d = DecimalType(30, 8)
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg((dsum(col("value")) / count(lit(1))).as("xm"))
      val series = hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour"), col("xm"))))
          .as("ser"),
          (sum(col("xm").cast(d)).cast("double") / count(lit(1)))
            .as("mu"))
      // the oracle replays this recursion as a recursive CTE (DuckDB's
      // lambda struct-field aliasing proved unstable for multi-field
      // state); s' is written out once here and three times there, with
      // identical arithmetic either way
      def step(acc: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) = {
        val sNew = greatest(lit(0.0),
          acc("s") + x - col("mu") - lit(k))
        struct(greatest(acc("mx"), sNew).as("mx"),
          (acc("al") + when(sNew > h, 1).otherwise(0)).as("al"),
          sNew.as("s"))
      }
      series.select(col("event_type"),
          size(col("ser")).cast("long").as("n_hours"),
          aggregate(transform(col("ser"), p => p("xm")),
            struct(lit(0.0).as("mx"), lit(0).as("al"), lit(0.0).as("s")),
            step).as("f"))
        .select(col("event_type"), col("n_hours"),
          round(col("f.s"), 6).as("cusum_final"),
          round(col("f.mx"), 6).as("cusum_max"),
          col("f.al").cast("long").as("alarm_hours"))
        .orderBy("event_type")
    },

    // ---- Holt linear smoothing (double exponential — level + trend):
    // l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
    // b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}, seeded l_1 = x_1, b_1 = 0;
    // the one-step forecast l + b is the seasonal-naive baseline
    // anomaly scorers subtract. Same cross-engine struct fold as q118;
    // the trend needs BOTH the previous and the new level, so the state
    // carries `lp` (previous level) and the oracle orders fields
    // (lp, l, b): under DuckDB's sequential field evaluation `lp` reads
    // the old level before `l` overwrites it, and `b` then reads the NEW
    // `l` and the saved `lp` — matching Spark's pure struct exactly. -------
    "q119_holt" -> { (s, dir) =>
      val alpha = 0.5
      val beta = 0.25
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg((dsum(col("value")) / count(lit(1))).as("xm"))
      val series = hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour"), col("xm"))))
          .as("ser"))
      def step(acc: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) = {
        val lNew = when(acc("n") === 0, x)
          .otherwise(lit(alpha) * x +
            lit(1.0 - alpha) * (acc("l") + acc("b")))
        struct(acc("l").as("lp"), lNew.as("l"),
          when(acc("n") === 0, lit(0.0))
            .otherwise(lit(beta) * (lNew - acc("l")) +
              lit(1.0 - beta) * acc("b")).as("b"),
          (acc("n") + 1).as("n"))
      }
      series.select(col("event_type"),
          aggregate(transform(col("ser"), p => p("xm")),
            struct(lit(0.0).as("lp"), lit(0.0).as("l"), lit(0.0).as("b"),
              lit(0).as("n")),
            step).as("f"))
        .select(col("event_type"), col("f.n").cast("long").as("n_hours"),
          round(col("f.l"), 6).as("level"),
          round(col("f.b"), 6).as("trend"),
          round(col("f.l") + col("f.b"), 6).as("forecast_next"))
        .orderBy("event_type")
    },

    // ---- Holt-Winters additive triple smoothing (level + trend +
    // 24-slot hour-of-day seasonality — the q119 recursion extended with
    // the seasonal component q122 showed this corpus has):
    //   l_t = α·(x_t − s_slot) + (1−α)·(l_{t−1} + b_{t−1})
    //   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    //   s'_slot = γ·(x_t − l_t) + (1−γ)·s_slot        (slot = hour of day)
    // seeded l_1 = x_1, b_1 = 0, s = 0²⁴ (the first cycle learns the
    // seasonals from its own residuals — the streaming-friendly seeding;
    // a classic m-hour warmup average would need the series upfront).
    // α/β/γ are binary-exact literals (0.5/0.25/0.125) so both engines'
    // complements (0.5/0.75/0.875) are exact too — `1−0.3` in double is
    // 0.7000000000000001 and would diverge from a 0.7 SQL literal.
    // State is a struct with a 24-double array; the oracle carries the
    // same array through a recursive CTE via indexed list_transform.
    // Ref shape: timefusion's anomaly baselines (Holt/EWMA family). -----
    "q129_holt_winters" -> { (s, dir) =>
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg((dsum(col("value")) / count(lit(1))).as("xm"))
      val series = hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour"), col("xm"))))
          .as("ser"))
      def step(acc: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) = {
        val slot = x("slot")
        val sPrev = element_at(acc("seas"), slot + 1)
        val lNew = when(acc("n") === 0, x("xm"))
          .otherwise(lit(0.5) * (x("xm") - sPrev) +
            lit(0.5) * (acc("l") + acc("b")))
        val bNew = when(acc("n") === 0, lit(0.0))
          .otherwise(lit(0.25) * (lNew - acc("l")) + lit(0.75) * acc("b"))
        val sNew = lit(0.125) * (x("xm") - lNew) + lit(0.875) * sPrev
        struct(lNew.as("l"), bNew.as("b"),
          transform(acc("seas"),
            (v, i) => when(i === slot, sNew).otherwise(v)).as("seas"),
          (acc("n") + 1).as("n"), slot.as("lastSlot"))
      }
      val nextIdx = ((col("f.lastSlot") + 1) % 24) + 1
      series.select(col("event_type"),
          aggregate(
            transform(col("ser"), p =>
              struct(p("xm").as("xm"), hour(p("hour")).as("slot"))),
            struct(lit(0.0).as("l"), lit(0.0).as("b"),
              array_repeat(lit(0.0), 24).as("seas"),
              lit(0).as("n"), lit(0).as("lastSlot")),
            step).as("f"))
        .select(col("event_type"), col("f.n").cast("long").as("n_hours"),
          round(col("f.l"), 6).as("level"),
          round(col("f.b"), 6).as("trend"),
          round(element_at(col("f.seas"), nextIdx), 6).as("seasonal_next"),
          round(col("f.l") + col("f.b") + element_at(col("f.seas"), nextIdx),
            6).as("forecast_next"))
        .orderBy("event_type")
    },

    // ---- log template mining (the Drain-family "log pattern" summary a
    // log store runs at ingest): mask the variable fields of each line —
    // digit runs → <NUM>; extensible to hex ids/uuids — and group by the
    // resulting template: volume, distinct emitters, first/last seen.
    // Deterministic (a pure regex rewrite + exact aggregation), so fully
    // oracle-gated, unlike similarity-based log clustering. Scales as one
    // scan + one hash aggregation on the template (template cardinality
    // is the pattern catalog, not the log volume). --------------------------
    "q131_log_templates" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(regexp_replace(
            concat(col("event_type"), lit(" "), col("props")),
            "[0-9]+", "<NUM>").as("template"),
          col("user_id"), col("ts"))
        .groupBy("template")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts")).cast("timestamp_ntz").as("first_seen"),
          max(col("ts")).cast("timestamp_ntz").as("last_seen"))
        .orderBy(desc("n"), col("template"))
    },

    // ---- event-sequence mining (the product-analytics "top paths"
    // surface): every length-3 window of a user's event-type journey in
    // (ts, event_id) order, counted globally with distinct-user support.
    // The per-user ordering is one shuffle on user_id (lead() window);
    // the path aggregation is a hash agg on the path string — path
    // cardinality is |event_type|³ at most, catalog-sized. Total order
    // (n DESC, path) makes the top-25 cut deterministic. ------------------
    "q132_event_sequences" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
          .as("path"), col("user_id"))
        .groupBy("path")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(desc("n"), col("path"))
        .limit(25)
    },

    // ---- seasonal-naive residuals (the baseline q117's seasonality
    // detection justifies): per series, the hour-of-day mean over all
    // days is the expected volume; the top-3 hours by positive residual
    // are "unusually busy FOR THAT time of day" — the seasonal anomaly
    // surface a flat threshold cannot express. Counts are integers, the
    // baseline is one exact division, ranking is total-ordered —
    // oracle-exact. ------------------------------------------------------
    "q122_seasonal_residual" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("hod", hour(col("hour")))
      val base = hourly.groupBy("event_type", "hod")
        .agg((sum(col("n")).cast("double") / count(lit(1))).as("baseline"))
      val w = Window.partitionBy("event_type")
        .orderBy((col("n") - col("baseline")).desc, col("hour"))
      hourly.join(base, Seq("event_type", "hod"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("event_type"), col("rnk"), col("hour"), col("n"),
          round(col("baseline"), 6).as("baseline"),
          round(col("n") - col("baseline"), 6).as("residual"))
        .orderBy("event_type", "rnk")
    },

    // ---- cross-series correlation (incident triage's "which metrics
    // move together"): Pearson r between every pair of event types'
    // hourly volume series over their common hours. Five DECIMAL-routed
    // sums per pair, sqrt (correctly-rounded IEEE, identical in any
    // engine) and division at the end — oracle-exact. The pair join keys
    // on the hour; series count is small (it is a metric catalog, not
    // data), so the pair space is catalog², never data². ------------------
    "q123_series_correlation" -> { (s, dir) =>
      val d = DecimalType(30, 8)
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"))
      val a = hourly.select(col("event_type").as("type_a"), col("hour"),
        col("n").as("x"))
      val b = hourly.select(col("event_type").as("type_b"), col("hour"),
        col("n").as("y"))
      a.join(b, Seq("hour")).filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).cast("double").as("np"),
          sum(col("x").cast(d)).cast("double").as("sx"),
          sum(col("y").cast(d)).cast("double").as("sy"),
          sum((col("x") * col("y")).cast(d)).cast("double").as("sxy"),
          sum((col("x") * col("x")).cast(d)).cast("double").as("sx2"),
          sum((col("y") * col("y")).cast(d)).cast("double").as("sy2"))
        .select(col("type_a"), col("type_b"),
          col("np").cast("long").as("n_hours"),
          round((col("np") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("np") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("np") * col("sy2") - col("sy") * col("sy"))), 6)
            .as("r"))
        .orderBy("type_a", "type_b")
    },

    // ---- Apdex score (the industry SLA satisfaction index): with target
    // T, requests ≤ T are satisfied, ≤ 4T tolerating, else frustrated;
    // Apdex = (satisfied + tolerating/2) / total. Pure integer counts
    // until one final division — oracle-exact; one map-side-combinable
    // aggregation per (service, day). --------------------------------------
    "q124_apdex" -> { (s, dir) =>
      val t = 50.0
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("n"),
          count(when(col("value") <= t, lit(1))).as("n_satisfied"),
          count(when(col("value") > t && col("value") <= 4 * t, lit(1)))
            .as("n_tolerating"))
        .select(col("event_type"), col("day"), col("n"),
          col("n_satisfied"), col("n_tolerating"),
          round((col("n_satisfied") + col("n_tolerating") / lit(2.0)) /
            col("n"), 6).as("apdex"))
        .orderBy("event_type", "day")
    },

    // ---- A2/A3: t-digest percentile sketch (README p95 query shape) -------
    // No DuckDB oracle: sketch estimates are approximate and merge-order
    // dependent; PercentileAggSpec pins accuracy against exact percentiles.
    "q22_percentile_tdigest" -> { (s, dir) =>
      import graft.functions.PercentileAgg._
      Tables.events(s, dir)
        .groupBy(F.time_bucket("1 day", col("ts")).as("day"), col("event_type"))
        .agg(percentile_agg(col("value")).as("digest"), count(lit(1)).as("n"))
        .select(col("day"), col("event_type"),
          approx_percentile(0.5, col("digest")).as("p50"),
          approx_percentile(0.95, col("digest")).as("p95"), col("n"))
        .orderBy("day", "event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "q14_time_bucket" ->
      """SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600000000) AS bucket,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_to_char" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        | strftime(CAST(ts AS TIMESTAMP), '%a') AS dow,
        | count(*) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q16_extract_epoch" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0 AS epoch_s
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,

    // NB: DuckDB sum(BIGINT) yields HUGEINT (→ float64 in the driver's
    // pandas compare) — CAST back to BIGINT so the hash sees int64 = int64.
    "q17_json_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_variant_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod,
        | count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_at_time_zone" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP) + INTERVAL 330 MINUTE, '%Y-%m-%d %H') AS kolkata_hour,
        | count(*) AS n
        |FROM events
        |GROUP BY 1 ORDER BY 1 LIMIT 48""".stripMargin,

    "q20_json_build" ->
      """SELECT event_id,
        | CAST(json_array(event_type, user_id, json(props)) AS VARCHAR) AS arr,
        | CAST(json(props) AS VARCHAR) AS obj
        |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin,

    "q41_session_window" ->
      """WITH ev AS (
        | SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        | FROM events WHERE user_id < 30),
        |marked AS (
        | SELECT *, CASE WHEN ts - lag(ts) OVER w < INTERVAL 30 MINUTE
        |   THEN 0 ELSE 1 END AS new_session
        | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        | SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |   ROWS UNBOUNDED PRECEDING) AS sid
        | FROM marked)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q72_asof_join" ->
      """WITH clicks AS (
        | SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        | FROM events WHERE event_type = 'click'),
        |errs AS (
        | SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  max_by(value, event_id) AS err_value
        | FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        | e.err_value, e.ts AS err_ts
        |FROM clicks c ASOF LEFT JOIN errs e
        | ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,

    "q87_gapfill_locf" ->
      """WITH hourly AS (
        | SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        | FROM events
        | WHERE user_id < 10 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08'
        | GROUP BY 1, 2),
        |series AS (
        | SELECT user_id,
        |  unnest(generate_series(min(bucket), max(bucket),
        |    INTERVAL 1 HOUR)) AS bucket
        | FROM hourly GROUP BY user_id)
        |SELECT s.user_id, s.bucket, h.n IS NULL AS filled,
        | round(last_value(h.sum_value / h.n IGNORE NULLS) OVER (
        |   PARTITION BY s.user_id ORDER BY s.bucket
        |   ROWS UNBOUNDED PRECEDING), 6) AS value_locf
        |FROM series s LEFT JOIN hourly h USING (user_id, bucket)
        |ORDER BY s.user_id, s.bucket""".stripMargin,

    "q101_counter_increase" ->
      """WITH d AS (
        | SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value,
        |   lag(value) OVER (PARTITION BY event_type
        |     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        | FROM events)
        |SELECT event_type, date_trunc('hour', ts) AS hour,
        |  CAST(sum(CAST(CASE WHEN prev IS NULL THEN 0
        |    WHEN value < prev THEN value
        |    ELSE value - prev END AS DECIMAL(18,6))) AS DOUBLE) AS increase,
        |  count(*) AS n
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q102_bucket_trend" ->
      """WITH b AS (
        | SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |   (epoch_us(CAST(ts AS TIMESTAMP))
        |     - epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))) / 1e6 AS x,
        |   value
        | FROM events),
        |s AS (
        | SELECT event_type, day,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(30,8))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * value AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(x * x AS DECIMAL(30,8))) AS DOUBLE) AS sx2
        | FROM b GROUP BY 1, 2)
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / NULLIF(n * sx2 - sx * sx, 0), 6)
        |    AS slope,
        |  round((sy * sx2 - sx * sxy) / NULLIF(n * sx2 - sx * sx, 0), 6)
        |    AS intercept
        |FROM s ORDER BY 1, 2""".stripMargin,

    "q103_outlier_mad" ->
      """WITH m AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med
        | FROM events GROUP BY 1),
        |d AS (
        | SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        | FROM events e JOIN m USING (event_type)),
        |s AS (
        | SELECT event_type, min(med) AS med,
        |  quantile_cont(ad, 0.5) AS mad, count(*) AS n
        | FROM d GROUP BY 1),
        |o AS (
        | SELECT d.event_type, count(*) AS n_outliers
        | FROM d JOIN s USING (event_type)
        | WHERE d.ad > 3.0 * s.mad GROUP BY 1)
        |SELECT s.event_type, round(s.med, 6) AS median,
        |  round(s.mad, 6) AS mad, s.n,
        |  coalesce(o.n_outliers, 0) AS n_outliers
        |FROM s LEFT JOIN o USING (event_type) ORDER BY 1""".stripMargin,

    "q106_histogram_quantile" ->
      """WITH bucketed AS (
        | SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  CASE WHEN value >= 90.0 THEN 'inf'::DOUBLE
        |       ELSE (floor(value / 10.0) + 1) * 10.0 END AS le,
        |  count(*) AS cnt
        | FROM events GROUP BY 1, 2, 3),
        |c1 AS (
        | SELECT *,
        |  sum(cnt) OVER (PARTITION BY event_type, day ORDER BY le
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(cnt) OVER (PARTITION BY event_type, day) AS total,
        |  max(CASE WHEN le != 'inf'::DOUBLE THEN le END)
        |    OVER (PARTITION BY event_type, day) AS max_finite
        | FROM bucketed),
        |c2 AS (
        | SELECT *,
        |  coalesce(lag(le) OVER (PARTITION BY event_type, day ORDER BY le),
        |    0.0) AS prev_le,
        |  coalesce(lag(cum) OVER (PARTITION BY event_type, day ORDER BY le),
        |    0) AS prev_cum
        | FROM c1),
        |winner AS (
        | SELECT * FROM c2 WHERE cum >= 0.95 * total
        | QUALIFY row_number() OVER (PARTITION BY event_type, day
        |   ORDER BY le) = 1)
        |SELECT event_type, day, CAST(total AS BIGINT) AS n,
        | CASE WHEN le = 'inf'::DOUBLE THEN max_finite
        |      ELSE round(prev_le + (le - prev_le) *
        |        (0.95 * total - prev_cum) / (cum - prev_cum), 6) END AS p95
        |FROM winner ORDER BY 1, 2""".stripMargin,

    "q107_range_join_binned" ->
      """WITH e AS (
        | SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        | FROM events WHERE event_type = 'error'),
        |c AS (
        | SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        | FROM events WHERE event_type = 'click')
        |SELECT e.event_id, count(c.event_id) AS n_nearby,
        | CAST(coalesce(sum(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE)
        |   AS sum_nearby
        |FROM e LEFT JOIN c ON abs(c.us - e.us) <= 60000000
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "q108_ewma" ->
      """SELECT user_id, count(*) AS n,
        | round(list_reduce(
        |   list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |   (acc, x) -> 0.25 * x + 0.75 * acc), 6) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q116_gapfill_interp" ->
      """WITH hourly AS (
        | SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        | FROM events
        | WHERE user_id < 10 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08'
        | GROUP BY 1, 2),
        |series AS (
        | SELECT user_id,
        |  unnest(generate_series(min(bucket), max(bucket),
        |    INTERVAL 1 HOUR)) AS bucket
        | FROM hourly GROUP BY user_id),
        |j AS (
        | SELECT s.user_id, s.bucket, h.n, h.sum_value / h.n AS v,
        |  epoch_us(s.bucket) AS bus
        | FROM series s LEFT JOIN hourly h USING (user_id, bucket)),
        |e AS (
        | SELECT *,
        |  last_value(CASE WHEN v IS NOT NULL
        |    THEN struct_pack(b := bus, v := v) END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY bucket
        |     ROWS UNBOUNDED PRECEDING) AS p,
        |  first_value(CASE WHEN v IS NOT NULL
        |    THEN struct_pack(b := bus, v := v) END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY bucket
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        | FROM j)
        |SELECT user_id, bucket, n IS NULL AS filled,
        | round(CASE WHEN v IS NOT NULL THEN v
        |   WHEN p IS NOT NULL AND nx IS NOT NULL
        |   THEN p.v + (nx.v - p.v) *
        |     ((bus - p.b)::DOUBLE / (nx.b - p.b)) END, 6) AS value_interp
        |FROM e ORDER BY user_id, bucket""".stripMargin,

    // oracle via RECURSIVE CTE, like q119: DuckDB's lambda struct-field
    // aliasing is not stable enough to carry multi-field fold state (a
    // field can observe another field's NEW value — probed on q119), so
    // the recursion steps row-by-row with pure CTE semantics; s' is
    // inlined three times with identical arithmetic, matching Spark's
    // fold bit-for-bit.
    "q118_cusum" ->
      """WITH RECURSIVE hourly AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS xm
        | FROM events GROUP BY 1, 2),
        |stats AS (
        | SELECT event_type,
        |  CAST(sum(CAST(xm AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS mu
        | FROM hourly GROUP BY 1),
        |r AS (
        | SELECT event_type, xm,
        |  row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
        | FROM hourly),
        |c AS (
        | SELECT r.event_type, r.rn,
        |  greatest(0.0::DOUBLE, r.xm - st.mu - 2.0::DOUBLE) AS s,
        |  greatest(0.0::DOUBLE, r.xm - st.mu - 2.0::DOUBLE) AS mx,
        |  CASE WHEN greatest(0.0::DOUBLE, r.xm - st.mu - 2.0::DOUBLE) > 8.0
        |    THEN 1 ELSE 0 END AS al
        | FROM r JOIN stats st USING (event_type) WHERE r.rn = 1
        | UNION ALL
        | SELECT n.event_type, n.rn,
        |  greatest(0.0::DOUBLE, c.s + n.xm - st.mu - 2.0::DOUBLE) AS s,
        |  greatest(c.mx,
        |    greatest(0.0::DOUBLE, c.s + n.xm - st.mu - 2.0::DOUBLE)) AS mx,
        |  c.al + CASE WHEN
        |    greatest(0.0::DOUBLE, c.s + n.xm - st.mu - 2.0::DOUBLE) > 8.0
        |    THEN 1 ELSE 0 END AS al
        | FROM c JOIN r n
        |  ON n.event_type = c.event_type AND n.rn = c.rn + 1
        | JOIN stats st ON st.event_type = n.event_type),
        |last AS (SELECT event_type, max(rn) AS mxr FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(c.rn AS BIGINT) AS n_hours,
        | round(c.s, 6) AS cusum_final, round(c.mx, 6) AS cusum_max,
        | CAST(c.al AS BIGINT) AS alarm_hours
        |FROM c JOIN last t ON c.event_type = t.event_type AND c.rn = t.mxr
        |ORDER BY 1""".stripMargin,

    // oracle via RECURSIVE CTE (row-per-step), not a struct list_reduce:
    // a two-field recursion needs the old AND new level in one step, and
    // DuckDB's lambda struct-field aliasing is not stable enough to carry
    // multi-field state (probed: a field reading acc.l can observe the
    // NEW level even when written later). The CTE has standard pure
    // semantics; the level expression is inlined twice in the trend with
    // identical arithmetic, matching Spark's fold bit-for-bit.
    "q119_holt" ->
      """WITH RECURSIVE hourly AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS xm
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT event_type, xm,
        |  row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
        | FROM hourly),
        |hw AS (
        | SELECT event_type, rn, xm AS l, 0.0::DOUBLE AS b
        | FROM r WHERE rn = 1
        | UNION ALL
        | SELECT n.event_type, n.rn,
        |  0.5::DOUBLE * n.xm + 0.5::DOUBLE * (h.l + h.b) AS l,
        |  0.25::DOUBLE * ((0.5::DOUBLE * n.xm + 0.5::DOUBLE * (h.l + h.b))
        |    - h.l) + 0.75::DOUBLE * h.b AS b
        | FROM hw h JOIN r n
        |  ON n.event_type = h.event_type AND n.rn = h.rn + 1),
        |last AS (SELECT event_type, max(rn) AS mx FROM hw GROUP BY 1)
        |SELECT h.event_type, CAST(h.rn AS BIGINT) AS n_hours,
        | round(h.l, 6) AS level, round(h.b, 6) AS trend,
        | round(h.l + h.b, 6) AS forecast_next
        |FROM hw h JOIN last t
        | ON h.event_type = t.event_type AND h.rn = t.mx
        |ORDER BY 1""".stripMargin,

    // the q119 recursive-CTE shape with the 24-double seasonal vector
    // carried as a list column: the anchor builds 0.0²⁴, each step
    // rewrites one slot via indexed list_transform (1-based index i =
    // slot + 1), and the level expression is inlined into the trend and
    // seasonal updates with the identical arithmetic as Spark's pure
    // struct fold. All constants are binary-exact doubles.
    "q129_holt_winters" ->
      """WITH RECURSIVE hourly AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS xm
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT event_type, xm,
        |  CAST(extract(hour FROM hour) AS INT) AS slot,
        |  row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
        | FROM hourly),
        |hw AS (
        | SELECT event_type, rn, slot, xm AS l, 0.0::DOUBLE AS b,
        |  list_transform(range(24), x -> 0.0::DOUBLE) AS seas
        | FROM r WHERE rn = 1
        | UNION ALL
        | SELECT n.event_type, n.rn, n.slot,
        |  0.5::DOUBLE * (n.xm - h.seas[n.slot + 1])
        |    + 0.5::DOUBLE * (h.l + h.b) AS l,
        |  0.25::DOUBLE * ((0.5::DOUBLE * (n.xm - h.seas[n.slot + 1])
        |      + 0.5::DOUBLE * (h.l + h.b)) - h.l)
        |    + 0.75::DOUBLE * h.b AS b,
        |  list_transform(h.seas, (v, i) -> CASE WHEN i = n.slot + 1
        |    THEN 0.125::DOUBLE * (n.xm
        |        - (0.5::DOUBLE * (n.xm - h.seas[n.slot + 1])
        |          + 0.5::DOUBLE * (h.l + h.b)))
        |      + 0.875::DOUBLE * h.seas[n.slot + 1]
        |    ELSE v END) AS seas
        | FROM hw h JOIN r n
        |  ON n.event_type = h.event_type AND n.rn = h.rn + 1),
        |last AS (SELECT event_type, max(rn) AS mx FROM hw GROUP BY 1)
        |SELECT h.event_type, CAST(h.rn AS BIGINT) AS n_hours,
        | round(h.l, 6) AS level, round(h.b, 6) AS trend,
        | round(h.seas[((h.slot + 1) % 24) + 1], 6) AS seasonal_next,
        | round(h.l + h.b + h.seas[((h.slot + 1) % 24) + 1], 6)
        |   AS forecast_next
        |FROM hw h JOIN last t
        | ON h.event_type = t.event_type AND h.rn = t.mx
        |ORDER BY 1""".stripMargin,

    "q131_log_templates" ->
      """SELECT regexp_replace(event_type || ' ' || props,
        |    '[0-9]+', '<NUM>', 'g') AS template,
        | count(*) AS n, count(DISTINCT user_id) AS n_users,
        | min(CAST(ts AS TIMESTAMP)) AS first_seen,
        | max(CAST(ts AS TIMESTAMP)) AS last_seen
        |FROM events GROUP BY 1 ORDER BY n DESC, template""".stripMargin,

    "q132_event_sequences" ->
      """WITH seq AS (
        | SELECT event_type,
        |  lead(event_type, 1) OVER w AS e2,
        |  lead(event_type, 2) OVER w AS e3,
        |  user_id
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
        | count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,

    "q124_apdex" ->
      """SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        | count(*) AS n,
        | count(CASE WHEN value <= 50.0 THEN 1 END) AS n_satisfied,
        | count(CASE WHEN value > 50.0 AND value <= 200.0 THEN 1 END)
        |   AS n_tolerating,
        | round((count(CASE WHEN value <= 50.0 THEN 1 END)
        |   + count(CASE WHEN value > 50.0 AND value <= 200.0 THEN 1 END)
        |     / 2.0::DOUBLE) / count(*), 6) AS apdex
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q122_seasonal_residual" ->
      """WITH hourly AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |h2 AS (SELECT *, extract(hour FROM hour) AS hod FROM hourly),
        |base AS (
        | SELECT event_type, hod,
        |  CAST(sum(n) AS DOUBLE) / count(*) AS baseline
        | FROM h2 GROUP BY 1, 2),
        |r AS (
        | SELECT h2.event_type, h2.hour, h2.n, base.baseline,
        |  row_number() OVER (PARTITION BY h2.event_type
        |    ORDER BY h2.n - base.baseline DESC, h2.hour) AS rnk
        | FROM h2 JOIN base USING (event_type, hod))
        |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, hour, n,
        | round(baseline, 6) AS baseline,
        | round(n - baseline, 6) AS residual
        |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    "q123_series_correlation" ->
      """WITH hourly AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS DOUBLE) AS np,
        |  CAST(sum(CAST(a.n AS DECIMAL(30,8))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(b.n AS DECIMAL(30,8))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(a.n * b.n AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(a.n * a.n AS DECIMAL(30,8))) AS DOUBLE) AS sx2,
        |  CAST(sum(CAST(b.n * b.n AS DECIMAL(30,8))) AS DOUBLE) AS sy2
        | FROM hourly a JOIN hourly b
        |  ON a.hour = b.hour AND a.event_type < b.event_type
        | GROUP BY 1, 2)
        |SELECT type_a, type_b, CAST(np AS BIGINT) AS n_hours,
        | round((np * sxy - sx * sy) /
        |   (sqrt(np * sx2 - sx * sx) * sqrt(np * sy2 - sy * sy)), 6) AS r
        |FROM p ORDER BY 1, 2""".stripMargin,

    "q117_autocorrelation" ->
      """WITH h AS (
        | SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  count(*) AS n
        | FROM events GROUP BY 1, 2),
        |d AS (
        | SELECT event_type, hour, n,
        |  n - avg(n) OVER (PARTITION BY event_type) AS dx
        | FROM h),
        |d2 AS (
        | SELECT *, lead(dx, 24) OVER (PARTITION BY event_type ORDER BY hour)
        |   AS dy
        | FROM d)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        | round(CAST(sum(CAST(CASE WHEN dy IS NOT NULL THEN dx * dy END
        |     AS DECIMAL(30,8))) AS DOUBLE)
        |   / CAST(sum(CAST(dx * dx AS DECIMAL(30,8))) AS DOUBLE), 6)
        |   AS acf_24h
        |FROM d2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q114_burn_rate" ->
      """WITH h AS (
        | SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  count(*) AS n,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err
        | FROM events GROUP BY 1),
        |r AS (
        | SELECT hour, n, n_err,
        |  CAST(sum(n) OVER w AS BIGINT) AS n6,
        |  CAST(sum(n_err) OVER w AS BIGINT) AS e6
        | FROM h WINDOW w AS (ORDER BY hour
        |   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT hour, n, n_err,
        | round((n_err / n) / 0.10, 6) AS burn_1h,
        | round((e6 / n6) / 0.10, 6) AS burn_6h,
        | round((n_err / n) / 0.10, 6) > 1.0
        |   AND round((e6 / n6) / 0.10, 6) > 1.0 AS alert
        |FROM r ORDER BY hour""".stripMargin,

    "q86_time_weighted_avg" ->
      """WITH seq AS (
        | SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lead(CAST(ts AS TIMESTAMP)) OVER
        |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS next_ts
        | FROM events)
        |SELECT user_id, count(*) AS n_intervals,
        | round(sum(value * CAST(epoch_us(next_ts) - epoch_us(ts) AS DOUBLE))
        |   / sum(CAST(epoch_us(next_ts) - epoch_us(ts) AS DOUBLE)), 6) AS twa
        |FROM seq WHERE next_ts IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q82_value_histogram" ->
      """SELECT event_type,
        | CAST(least(floor(value / 10.0), 9.0) AS BIGINT) AS bin,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q81_cohort_retention" ->
      """WITH ev AS (
        | SELECT user_id,
        |  date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        | FROM events),
        |cohort AS (
        | SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week,
        | date_diff('day', cohort_week, wk) // 7 AS week_offset,
        | count(DISTINCT user_id) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q80_funnel" ->
      """WITH ev AS (
        | SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        | FROM events),
        |s1 AS (
        | SELECT user_id, min(ts) AS step_1_ts FROM ev
        | WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        | SELECT e.user_id, min(e.ts) AS step_2_ts
        | FROM ev e JOIN s1 USING (user_id)
        | WHERE e.event_type = 'click' AND e.ts > s1.step_1_ts
        |  AND e.ts <= s1.step_1_ts + INTERVAL 24 HOUR
        | GROUP BY 1),
        |s3 AS (
        | SELECT e.user_id, min(e.ts) AS step_3_ts
        | FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        | WHERE e.event_type = 'purchase' AND e.ts > s2.step_2_ts
        |  AND e.ts <= s1.step_1_ts + INTERVAL 24 HOUR
        | GROUP BY 1)
        |SELECT s1.user_id, step_1_ts, step_2_ts, step_3_ts
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,

    "q39_array_ops" ->
      """WITH toks AS (
        | SELECT list_distinct(string_split_regex(lower(text), '\s+')) AS ts
        | FROM documents)
        |SELECT list_has_any(ts, ['spark', 'merge']) AS has_any,
        | list_has_all(ts, ['the', 'of']) AS has_all,
        | list_contains(ts, 'window') AS eq_any,
        | count(*) AS n
        |FROM toks GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q40_json_elements" ->
      """SELECT event_id, elem FROM (
        | SELECT event_id,
        |   unnest([event_type, json_extract_string(props, '$.k')]) AS elem
        | FROM events WHERE event_id < 100)
        |ORDER BY event_id, elem""".stripMargin,

    "q21_text_match" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE contains(lower(text), 'spark')
        |  AND contains(lower(text), 'merge')
        |  AND contains(lower(text), 'window')
        |ORDER BY doc_id""".stripMargin
  )
}
