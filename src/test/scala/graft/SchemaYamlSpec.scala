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

  test("every shipped schema drives a live table end-to-end") {
    // beyond parsing: each reference schema must actually WORK as a
    // GraftTable — synthesize one row per declared column type, append
    // through the conforming write (bloom/dictionary options included),
    // and resolve it back
    assume(Files.exists(Paths.get(dir)))
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".yaml"))
    files.foreach { f =>
      val loaded = SchemaYaml.load(f)
      val t = new graft.sources.GraftTable(spark,
        Files.createTempDirectory(s"graft_yaml_${loaded.table.name}_").toString,
        loaded.table)
      val row = loaded.table.schema.fields
        .filterNot(fd => fd.name == "date" ||
          fd.name == loaded.table.dedupTiebreak).map { fd =>
          val v: org.apache.spark.sql.Column = fd.dataType match {
            case StringType => lit("x")
            case LongType => lit(7L)
            case IntegerType => lit(7)
            case DoubleType => lit(1.5)
            case BooleanType => lit(false)
            case TimestampNTZType | TimestampType =>
              lit("2024-03-01 10:00:00").cast("timestamp_ntz")
            case DateType => lit("2024-03-01").cast("date")
            case VariantType => parse_json(lit("""{"k":1}"""))
            case ArrayType(et, _) => array().cast(ArrayType(et))
            case other => lit(null).cast(other)
          }
          v.as(fd.name)
        }
      t.append(spark.range(1).select(row.toIndexedSeq: _*),
        Some(java.time.LocalDateTime.of(2024, 3, 1, 12, 0)))
      assert(t.readResolved().count() == 1, s"$f round trip failed")
    }
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
