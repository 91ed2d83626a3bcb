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
    val dup = leftCols.intersect(payload)
    require(dup.isEmpty, s"ambiguous payload columns: ${dup.mkString(",")}")

    val matchedTs = rightTsAs.toSeq
    // tagged union: left rows carry nulls in the right-payload slots and
    // vice versa; the window then threads right values forward in time
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(col) ++ payload.map(c => lit(null).as(c)) ++
        matchedTs.map(n => lit(null).cast(left.schema(tsCol).dataType).as(n)): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).as(c)) ++ payload.map(col) ++
        matchedTs.map(n => col(tsCol).as(n)): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(keyCols.map(col) ++ Seq(col(tsCol), col("__side")) ++
        leftCols.map(col) ++
        (payload ++ matchedTs).map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }
}
