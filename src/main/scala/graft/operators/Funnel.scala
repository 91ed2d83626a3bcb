package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel — the standard product-analytics "did the
  * user view → click → purchase, in order, within the window" operator,
  * which the reference has no counterpart for (its dashboards stop at
  * per-type counts).
  *
  * First-touch-anchored, greedy-earliest semantics (the convention of
  * the usual product-analytics tools): the funnel is anchored at the
  * key's FIRST step-1 event; step i's time is then the earliest step-i
  * event STRICTLY after step i−1's time and no later than the anchor +
  * window. Given the anchor, the greedy choice is optimal — taking the
  * earliest event for each later step only enlarges the remaining
  * window — so a key completes the anchored funnel under greedy iff it
  * completes it at all. (A later step-1 occurrence is, by the
  * first-touch convention, a different funnel and not retried.)
  *
  * Scale design: NO self-join and no per-key event-array
  * materialization — each step is one filtered pass over the events,
  * shuffling only (key, ts) pairs, joined per key against the
  * previous-step frame (one row per surviving key). A collect_list
  * formulation shuffles whole per-key histories; a join formulation is
  * quadratic per key. `steps` is small and static, so the plan is
  * `|steps|` narrow aggregations.
  */
object Funnel {

  /** One row per key that performed step 1: `(keyCol, step_1_ts, …,
    * step_n_ts)` with later steps null where the chain broke. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowExpr: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("step_1_ts"))
      .withColumn("__deadline",
        col("step_1_ts") + expr(s"INTERVAL $windowExpr"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step_${i + 1}_ts"
      val cur = s"step_${i + 2}_ts"
      val nxt = events.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("__ts"))
        .join(acc.select(col(keyCol), col(prev), col("__deadline")), keyCol)
        .filter(col("__ts") > col(prev) && col("__ts") <= col("__deadline"))
        .groupBy(col(keyCol)).agg(min(col("__ts")).as(cur))
      acc.join(nxt, Seq(keyCol), "left")
    }.drop("__deadline")
  }
}
