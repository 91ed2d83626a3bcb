package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row enriched with the latest right row whose
  * timestamp is at or before the left row's, per key — the kdb `aj` /
  * QuestDB `ASOF JOIN` / pandas `merge_asof` shape, the canonical
  * "state at event time" lookup for event analytics (latest config,
  * latest error, latest price as of each observation).
  *
  * The reference engine has no as-of operator (SURVEY §2.3 — its join
  * surface is DataFusion's equi/range family), so this is a Spark-first
  * extension, and it deliberately is NOT a join: a range-predicate join
  * (`r.ts <= l.ts`) explodes to every earlier right row per left row
  * before a per-key top-1 — quadratic per key. Instead both sides are
  * UNIONED with a side tag and the right payload is carried forward with
  * `last(_, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side ROWS
  * UNBOUNDED PRECEDING)`: one shuffle of (key, ts) rows, one sort per
  * partition, output linear in |L|+|R|. At 100 TB the cost profile equals
  * a groupBy on the key — no pair-space term. Right rows order before
  * left rows at equal timestamps (side tag 0 < 1), making the match
  * inclusive (`r.ts <= l.ts`), same as DuckDB `ASOF JOIN ON l.ts >= r.ts`.
  *
  * The right side must be unique per (key, ts) — pre-aggregate it
  * otherwise (ties would make "the" latest row nondeterministic in any
  * engine).
  */
object AsOfJoin {

  /** Left-outer as-of join.
    *
    * @param left     probe side; all its columns pass through
    * @param right    build side; its non-key non-ts columns are appended
    *                 (null when no right row is at or before the left ts)
    * @param keyCols  equi-join keys present on both sides
    * @param tsCol    event-time column name present on both sides
    * @param rightTsAs when set, also emit the matched right row's
    *                  timestamp under this name
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightTsAs: Option[String] = None): DataFrame = {
    val payload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol).toSeq
    require(payload.nonEmpty, "right side carries no payload columns")
    val leftCols = left.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol).toSeq
    // every output name must be distinct, INCLUDING the matched-ts alias
    // and the internal side tag — a collision would otherwise surface as
    // an opaque ambiguous-reference AnalysisException deep in the window
    val outNames = keyCols ++ Seq(tsCol) ++ leftCols ++ payload ++
      rightTsAs.toSeq ++ Seq("__side", "__r")
    val dup = outNames.diff(outNames.distinct).distinct
    require(dup.isEmpty, s"ambiguous column names: ${dup.mkString(",")}")

    // tagged union; the whole right row (payload + its own ts) travels as
    // ONE struct, null on left rows — last(ignoreNulls) then carries the
    // latest right ROW forward atomically. Per-column carry would be
    // wrong: a right row with a genuinely NULL payload value is
    // indistinguishable from a left placeholder, so that column would
    // fall through to an OLDER right row while the matched-ts came from
    // the newer one.
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(payload.map(col) :+ col(tsCol).as("__rts"): _*)
            .schema.fields)).as("__r"): _*)
    // null-timestamp right rows match NOTHING under as-of semantics
    // (`r.ts <= l.ts` is null); unfiltered they would sort nulls-first
    // and fabricate a carried match for every row of their key
    val r = right.filter(col(tsCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+
        struct(payload.map(col) :+ col(tsCol).as("__rts"): _*).as("__r"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(keyCols.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
        payload.map(c => col(s"__r.$c").as(c)) ++
        rightTsAs.map(n => col("__r.__rts").as(n)): _*)
  }
}
