package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{SchemaYaml, TableSchemas}

/** The YAML loader reproduces the reference's shipped schemas
  * (`/root/reference/schemas/ yaml files`, loaded at runtime — nothing copied).
  */
class SchemaYamlSpec extends AnyFunSuite {
  private val dir = "/root/reference/schemas"

  private def available(name: String): Boolean =
    Files.exists(Paths.get(s"$dir/$name"))

  test("mor_versioned.yaml reproduces the hardcoded fixture schema exactly") {
    assume(available("mor_versioned.yaml"))
    val loaded = SchemaYaml.load(s"$dir/mor_versioned.yaml")
    val hard = TableSchemas.morVersioned
    assert(loaded.table.name == hard.name)
    assert(loaded.table.partitions == hard.partitions)
    assert(loaded.table.dedupKeys == hard.dedupKeys)
    assert(loaded.table.dedupTiebreak == hard.dedupTiebreak)
    assert(loaded.table.tombstoneColumn == hard.tombstoneColumn)
    assert(loaded.table.versionAppend == hard.versionAppend)
    assert(loaded.table.sortingColumns == hard.sortingColumns)
    assert(loaded.table.schema == hard.schema,
      s"\nloaded: ${loaded.table.schema.treeString}\nhard: ${hard.schema.treeString}")
    assert(loaded.zOrderColumns == Seq("timestamp", "id"))
    assert(loaded.table.zOrderColumns == hard.zOrderColumns)
  }

  test("otel_logs_and_spans.yaml: metadata + full field list load; the " +
    "hardcoded reduced schema is a type-compatible subset") {
    assume(available("otel_logs_and_spans.yaml"))
    val loaded = SchemaYaml.load(s"$dir/otel_logs_and_spans.yaml")
    val t = loaded.table
    assert(t.partitions == Seq("project_id", "date"))
    assert(t.dedupKeys == Seq("timestamp", "id"))
    assert(t.dedupTiebreak == "updated_at")
    assert(t.tombstoneColumn.contains("deleted"))
    assert(t.versionAppend)
    assert(t.sortingColumns.head.column == "timestamp" &&
      t.sortingColumns.head.descending && t.sortingColumns.head.nullsFirst)
    assert(t.schema.fields.length >= 90, s"full otel schema, got ${t.schema.fields.length}")
    // reduced schema ⊆ full schema with identical types
    val full = t.schema.fields.map(f => f.name -> f.dataType).toMap
    TableSchemas.otelLogsAndSpans.schema.fields.foreach { f =>
      assert(full.contains(f.name), s"missing field ${f.name}")
      assert(full(f.name) == f.dataType,
        s"${f.name}: yaml=${full(f.name)} hardcoded=${f.dataType}")
    }
    // per-field options surface (bloom filters on id-like columns)
    assert(loaded.fieldOptions("id").bloomFilter)
    assert(loaded.fieldOptions("parent_id").bloomFilter)
    assert(loaded.fieldOptions("id").tantivy.exists(_.contains("raw")))
  }

  test("every shipped schema file parses") {
    assume(Files.exists(Paths.get(dir)))
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".yaml"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val loaded = SchemaYaml.load(f)
      assert(loaded.table.schema.fields.nonEmpty, s"$f produced no fields")
      assert(loaded.table.dedupKeys.forall(loaded.table.schema.fieldNames.contains),
        s"$f dedup keys must be real columns")
    }
  }
}
