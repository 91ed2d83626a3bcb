package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.TableSchemas
import graft.sources.GraftTable

/** Plan-shape regression pins (the reference's
  * `ordered_union_for_topk.rs:184-329` plan asserts, Spark-side): the
  * load-bearing physical shapes behind the BASELINE numbers, asserted
  * against `queryExecution.executedPlan` so a rewrite that silently
  * downgrades a scan, join, or aggregation strategy turns the suite red
  * instead of only showing up as a bench regression rounds later.
  *
  * CORRECTNESS_r* pins values; this pins the HOW:
  *  - q44: the point lookup's id equality reaches parquet as a pushed
  *    filter and project_id prunes partitions before IO;
  *  - q13: the hourly-count scan reads ONLY (ts, user_id) and pushes the
  *    time range;
  *  - top-k page plan: WindowGroupLimit below TakeOrderedAndProject
  *    (per-partition top-k before the single merge);
  *  - q107/q115: the semantically-inequality joins stay equi-joins on
  *    their blocking keys — no BroadcastNestedLoop, no cartesian;
  *  - q109: the Gram pair aggregation partial-aggregates map-side.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Final adaptive plan: materialize, then unwrap the AQE root(s). */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node including sub-plans hidden under nested AQE roots and
    * reused exchanges/subqueries (collect() alone stops at those). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    })

  private def nodeNames(df: DataFrame): Seq[String] =
    allNodes(finalPlan(df)).map(_.nodeName)

  test("q44 point lookup: id pushed to parquet, project_id prunes partitions") {
    val df = SparkEntry.queries("q44_trace_lookup")(spark, sf)
    val scans = allNodes(finalPlan(df)).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "q44 must read through a file scan")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("EqualTo(id,500)"),
      s"id equality must reach the parquet reader, got: $pushed")
    val pf = scans.flatMap(_.partitionFilters).map(_.sql).mkString(";")
    assert(pf.contains("project_id"),
      s"project_id must prune partition directories, got: $pf")
  }

  test("q13 hourly counts: scan reads only (ts, user_id) and pushes the range") {
    val df = SparkEntry.queries("q13_hourly_counts")(spark, sf)
    val scan = allNodes(finalPlan(df))
      .collect { case s: FileSourceScanExec => s }.head
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("ts", "user_id"),
      s"column pruning regressed: scan reads $readCols")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThan(ts"),
      s"time range must push to the reader, got: $pushed")
  }

  test("resolved-view top-k plans as WindowGroupLimit + TakeOrderedAndProject") {
    val t = new GraftTable(spark,
      Files.createTempDirectory("graft_shape_").toString,
      TableSchemas.morVersioned)
    import spark.implicits._
    t.append(spark.range(48).select(
      (col("id") % 3).cast("string").as("project_id"),
      (lit("2024-03-01 00:00:00").cast("timestamp_ntz")
        + expr("make_interval(0, 0, 0, 0, id, 0, 0)")).as("timestamp"),
      concat(lit("r"), col("id")).as("id"),
      lit("n").as("name")),
      Some(java.time.LocalDateTime.of(2024, 4, 1, 0, 0)))
    // the page plan recentPage materializes per widening step: dedup
    // window (rank=1) → ORDER BY ts DESC LIMIT k. WindowGroupLimit keeps
    // per-partition top-1 BEFORE the rank shuffle; TakeOrderedAndProject
    // merges per-partition top-k without a global sort.
    val page = t.readResolved()
      .orderBy(col("timestamp").desc, col("id").desc).limit(10)
    val names = nodeNames(page)
    assert(names.exists(_.contains("WindowGroupLimit")),
      s"dedup window lost its group-limit pushdown: $names")
    assert(names.exists(_.contains("TakeOrderedAndProject")),
      s"top-k lost TakeOrderedAndProject: $names")
    assert(!names.exists(_.contains("GlobalSort")) &&
      !names.exists(n => n == "Sort" && names.count(_ == "Sort") > 2),
      s"top-k must not global-sort: $names")
  }

  test("q107 binned range join and q115 edit-distance join stay equi-joins") {
    Seq("q107_range_join_binned", "q115_edit_distance_join").foreach { q =>
      val names = nodeNames(SparkEntry.queries(q)(spark, sf))
      assert(!names.exists(_.contains("BroadcastNestedLoop")),
        s"$q degraded to BroadcastNestedLoopJoin: $names")
      assert(!names.exists(_.contains("CartesianProduct")),
        s"$q degraded to CartesianProduct: $names")
    }
  }

  test("q135 containment join stays an equi-join pipeline (prefix-filter " +
      "postings probe, no pair enumeration)") {
    val names = nodeNames(
      SparkEntry.queries("q135_containment_decontam")(spark, sf))
    assert(!names.exists(_.contains("BroadcastNestedLoop")),
      s"q135 degraded to BroadcastNestedLoopJoin: $names")
    assert(!names.exists(_.contains("CartesianProduct")),
      s"q135 degraded to CartesianProduct: $names")
  }

  test("q26 verify is inline: the exact-Jaccard threshold is the banded " +
      "join's tail conjunct and no exchange moves the pair stream") {
    // r11 shape: the token sets ride the banded self-join as payload and
    // the verify evaluates INSIDE the join condition (last conjunct), so
    // the candidate pair stream is never exchanged — the former re-join
    // verify shuffled every pair widened to its token array (867 MB of
    // q26's 1.38 GB sf1 shuffle and the whole 574 MB sf10 spill).
    val df = graft.operators.TextDedup.verifiedMinhashPairs(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      bands = 12, rowsPerBand = 8, threshold = 0.9)
    val nodes = allNodes(finalPlan(df))
    // 1. the verify lives in a join CONDITION, not a filter above an
    //    attach join — and the expensive intersect is the LAST conjunct
    //    (short-circuits after the cheap id</first-match-band pruning;
    //    prepended it measured 25.7 s vs 11.5 s for the stage at sf1)
    // strategy-independent: at this test's sf the planner may broadcast
    // the (tiny) banded side — since r15's left-semi repDocs gives the
    // keyed frame an HONEST size estimate instead of the old inner
    // join's row-product inflation — while corpus-scale stats keep the
    // shuffle strategies. The pinned property is WHERE the verify runs
    // (join condition), not which join family runs it.
    val joinConds = nodes.flatMap {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.condition.map(_.toString)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.condition.map(_.toString)
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.condition.map(_.toString)
      case _ => None
    }
    val verifying = joinConds.filter(_.contains("sorted_intersect_count"))
    assert(verifying.nonEmpty,
      s"no join condition carries the exact-Jaccard verify: $joinConds")
    assert(verifying.forall { c =>
      c.indexOf("sorted_intersect_count") > c.indexOf("<")
    }, "the intersect conjunct must come AFTER the cheap id< pruning")
    // 2. no join attaches token arrays to the pair stream by id anymore:
    //    every equi-join on id_a/id_b would be exactly that attach
    val attachJoins = nodes.filter {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.toString).mkString.contains("id_a") ||
          j.leftKeys.map(_.toString).mkString.contains("id_b")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.toString).mkString.contains("id_a") ||
          j.leftKeys.map(_.toString).mkString.contains("id_b")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.map(_.toString).mkString.contains("id_a") ||
          j.leftKeys.map(_.toString).mkString.contains("id_b")
      case _ => false
    }
    assert(attachJoins.isEmpty,
      s"pair stream re-joined by id (the shuffled-attach shape is back): " +
        s"${attachJoins.map(_.nodeName)}")
  }

  test("q109 gram matrix partial-aggregates map-side before the exchange") {
    val df = SparkEntry.queries("q109_gram_matrix")(spark, sf)
    val plan = finalPlan(df)
    val aggs = allNodes(plan).filter(_.nodeName.contains("HashAggregate"))
    // partial + final pair on the (i, j) keys: the (row × dim²) explosion
    // collapses to ≤ dim·(dim+1)/2 cells on the map side, so the exchange
    // moves cells, not element pairs
    assert(aggs.size >= 2,
      s"expected partial+final HashAggregate, got ${aggs.map(_.nodeName)}")
    val nodes = allNodes(plan)
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")) &&
      !nodes.exists(_.nodeName.contains("BroadcastNestedLoop")),
      "gram pair join degraded to an unblocked join")
  }
}
