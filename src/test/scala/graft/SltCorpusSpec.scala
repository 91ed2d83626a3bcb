package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.slt.SltRunner

/** Runs the reference's own sqllogictest corpus
  * (`/root/reference/tests/slt/`) against this engine — SURVEY.md §5 calls
  * this the highest-value test port. Files are read from the reference tree
  * at runtime (nothing is copied into this repo).
  */
class SltCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sltDir = "/root/reference/tests/slt"

  private def runFile(name: String): Unit = {
    val runner = new SltRunner(spark,
      Files.createTempDirectory(s"slt_${name.stripSuffix(".slt")}_").toString)
    val failures = runner.runFile(s"$sltDir/$name")
    assert(failures.isEmpty, failures.map(f =>
      s"\n${f.file}:${f.line}\n${f.sql}\n=> ${f.detail}").mkString("\n"))
  }

  for (f <- Seq("custom_functions.slt", "json_functions.slt", "merge_on_read.slt", "aggregations.slt", "basic_operations.slt", "filtering.slt", "edge_cases.slt", "percentile_functions.slt", "variant_column.slt", "variant_functions.slt", "distinct_on_variant.slt", "function_availability_test.slt", "integration.slt", "partition_pruning_test.slt"))
    test(s"slt: $f") {
      assume(Files.exists(Paths.get(s"$sltDir/$f")), s"$f not present")
      runFile(f)
    }
}
