package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Project}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.F

/** T2 — defer-expensive-projection: plan-shape proof that JSON building
  * moves above TopK (it does NOT happen built-in; verified by this spec's
  * negative control), plus result invariance.
  */
class DeferProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def topkSql = {
    F.registerAll(spark)
    graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("defer_ev")
    """SELECT json_build_array(event_type, user_id, props) AS j
      |FROM defer_ev ORDER BY ts DESC LIMIT 10""".stripMargin
  }

  test("expensive projection sits above the limit in the optimized plan") {
    val plan = spark.sql(topkSql).queryExecution.optimizedPlan
    plan match {
      case Project(list, _: GlobalLimit) =>
        assert(list.exists(_.exists(
          _.isInstanceOf[graft.functions.JsonBuildArray])),
          "moved projection must carry the JSON builder")
      case other => fail(s"expected Project above GlobalLimit, got:\n$other")
    }
  }

  test("deferral does not change results") {
    val deferred = spark.sql(topkSql).collect().map(_.getString(0))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev.filterNot(
      _ == graft.plans.DeferExpensiveProjection)
    try {
      val baseline = spark.sql(topkSql).collect().map(_.getString(0))
      assert(deferred.toSeq == baseline.toSeq)
      // negative control: without the rule the builder is NOT above the limit
      val plan = spark.sql(topkSql).queryExecution.optimizedPlan
      val above = plan match {
        case Project(list, _: GlobalLimit) =>
          list.exists(_.exists(_.isInstanceOf[graft.functions.JsonBuildArray]))
        case _ => false
      }
      assert(!above, "without the rule Catalyst leaves the builder below TopK")
    } finally spark.experimental.extraOptimizations = prev
  }
}
