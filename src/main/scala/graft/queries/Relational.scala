package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Core relational operator coverage (SURVEY.md §2.2–§2.7): hash
  * aggregation with FILTER/DISTINCT, multi-way broadcast joins,
  * anti/semi joins, ranking + frame window functions, top-k
  * (TakeOrderedAndProject), set ops, ROLLUP grouping sets, DISTINCT ON
  * (the read-side dedup shape, reference `src/read_dedup.rs`), exact
  * percentiles, and point/time-range lookups.
  *
  * Determinism contract with the DuckDB oracle:
  *  - double aggregates go through DECIMAL(18,s) so the sum is exact and
  *    engine-order-independent, then cast back to double;
  *  - averages are computed as exact-decimal-sum / count in double;
  *  - every query ends in a total ORDER BY with explicit null placement;
  *  - `row_number` is cast to BIGINT (DuckDB's native window type);
  *  - event timestamps are compared at microsecond precision (the oracle
  *    casts the ns-precision parquet column to TIMESTAMP).
  */
object Relational {

  /** Exact, order-independent sum of a double column: route through
    * decimal with the column's true scale, cast the total back to double.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** Shared CTE for q06/q09: per-(event_type, day) exact revenue. */
  private def dailyEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("day_sum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1: partial+final hash agg over decimal-exact measures -------
    "q01_pricing_summary" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A1: FILTER (WHERE …) + COUNT(DISTINCT) ------------------------
    "q02_conditional_agg" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          countDistinct(col("o_custkey")).as("n_customers"),
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice")))
            .as("sum_f_price"))
        .orderBy("o_orderpriority")
    },

    // ---- J: 4-way join, small dims broadcast ---------------------------
    "q03_revenue_by_nation" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val na = Tables.nation(s, dir)
      val re = Tables.region(s, dir)
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // ---- J: left-semi (EXISTS) + left-anti (NOT EXISTS) ----------------
    "q04_semi_anti_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      def leg(joinType: String, tag: String) =
        c.join(urgent, col("c_custkey") === col("o_custkey"), joinType)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .withColumn("tag", lit(tag))
      leg("left_semi", "with_urgent")
        .unionByName(leg("left_anti", "without_urgent"))
        .select("tag", "c_mktsegment", "n_customers")
        .orderBy("tag", "c_mktsegment")
    },

    // ---- W: ranking window, top-3 per group ----------------------------
    "q05_top_orders_per_priority" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    },

    // ---- W: sliding frame via explicit lag arithmetic (deterministic) --
    "q06_moving_avg" -> { (s, dir) =>
      val daily = dailyEvents(s, dir)
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val l1 = lag(col("day_sum"), 1).over(w)
      val l2 = lag(col("day_sum"), 2).over(w)
      daily
        .withColumn("ma3",
          (col("day_sum") + coalesce(l1, lit(0.0)) + coalesce(l2, lit(0.0))) /
            (lit(1) + l1.isNotNull.cast("int") + l2.isNotNull.cast("int")))
        .select("event_type", "day", "day_sum", "ma3")
        .orderBy("event_type", "day")
    },

    // ---- T: ORDER BY … LIMIT n → TakeOrderedAndProject -----------------
    "q07_topk_events" -> { (s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(100)
        .select("event_id", "event_type", "user_id", "value")
    },

    // ---- SO: INTERSECT / EXCEPT / UNION ALL in one result --------------
    "q08_setops" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def users(t: String) =
        ev.filter(col("event_type") === t).select("user_id").distinct()
      val both = users("click").intersect(users("purchase"))
        .withColumn("tag", lit("click_and_purchase"))
      val only = users("view").except(users("error"))
        .withColumn("tag", lit("view_no_error"))
      both.unionByName(only)
        .select("tag", "user_id")
        .orderBy("tag", "user_id")
    },

    // ---- A7: ROLLUP grouping sets --------------------------------------
    "q09_rollup" -> { (s, dir) =>
      Tables.events(s, dir)
        .rollup(col("event_type"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    },

    // ---- X1 shape: DISTINCT ON / keep-greatest dedup -------------------
    "q10_latest_event_per_user" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },

    // ---- point lookup (partition/stats-prunable filter) -----------------
    "q11_point_lookup" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") === 123L)
        .select("event_id", "user_id", "event_type", "value", "props")
    },

    // ---- A4: exact interpolated percentiles ----------------------------
    "q12_percentile_exact" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.5)), 3).as("p50"),
          round(percentile(col("value"), lit(0.95)), 3).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---- time-range count window (count_window dashboard shape) --------
    "q13_hourly_counts" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-05").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-12").cast("timestamp_ntz"))
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("hour")
    }
  )

  /** DuckDB-dialect oracle SQL, column-name and value aligned with the
    * Spark results above.
    */
  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_conditional_agg" ->
      """SELECT o_orderpriority,
        | count(*) AS n_orders,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        | count(DISTINCT o_custkey) AS n_customers,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_semi_anti_join" ->
      """SELECT 'with_urgent' AS tag, c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT 'without_urgent' AS tag, c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY tag, c_mktsegment""".stripMargin,

    "q05_top_orders_per_priority" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q06_moving_avg" ->
      """WITH daily AS (
        | SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |   count(*) AS n,
        |   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_sum
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, day, day_sum,
        | (day_sum
        |   + coalesce(lag(day_sum, 1) OVER w, 0.0)
        |   + coalesce(lag(day_sum, 2) OVER w, 0.0))
        | / (1 + CAST(lag(day_sum, 1) OVER w IS NOT NULL AS INTEGER)
        |      + CAST(lag(day_sum, 2) OVER w IS NOT NULL AS INTEGER)) AS ma3
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |ORDER BY event_type, day""".stripMargin,

    "q07_topk_events" ->
      """SELECT event_id, event_type, user_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin,

    "q08_setops" ->
      """SELECT 'click_and_purchase' AS tag, user_id FROM (
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        | INTERSECT
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'view_no_error' AS tag, user_id FROM (
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        | EXCEPT
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |ORDER BY tag, user_id""".stripMargin,

    "q09_rollup" ->
      """SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "q10_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT user_id, event_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q11_point_lookup" ->
      """SELECT event_id, user_id, event_type, value, props FROM events
        |WHERE event_id = 123""".stripMargin,

    "q12_percentile_exact" ->
      """SELECT event_type,
        | round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS DOUBLE), 3) AS p50,
        | round(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS DOUBLE), 3) AS p95,
        | count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q13_hourly_counts" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
        | count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-12'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
  )
}
