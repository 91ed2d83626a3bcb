package graft.sources

import org.apache.spark.sql.SparkSession

import graft.functions.GraftClock

/** X3: wide-scan admission control (reference `GatedScanExec`,
  * `/root/reference/src/database.rs:11890-11929,12314-12403`),
  * re-expressed at Spark's natural choke points.
  *
  * The reference wraps a "wide" scan — one reaching further back than
  * the configured lookback, or with no lower time bound at all — in an
  * `ExecutionPlan` whose streams draw permits from a global semaphore,
  * bounding the parquet-decode heap that concurrent heavy queries can
  * pin. Spark already bounds executor-side decode memory per task slot;
  * what a shared cluster still needs is (a) a cap on how many
  * heavy scans run CONCURRENTLY and (b) keeping dashboards responsive
  * while they do. Both live at the driver, where Spark's own admission
  * primitives sit, so the gate is applied around job submission rather
  * than inside the physical plan:
  *
  *  - a fair JVM semaphore bounds concurrent gated actions (the
  *    `heavy_scan_sem` role — on a shared driver every session submits
  *    through it);
  *  - while gated, the submitting thread's jobs are routed to a
  *    dedicated FAIR-scheduler pool (`spark.scheduler.pool` is a
  *    thread-local job property) so interactive queries in the default
  *    pool keep their share of task slots even while a wide scan holds
  *    a permit — the Spark-native rendering of "decode draws from the
  *    shared pool".
  *
  * The depth rule inherits the reference's hard-won refinement verbatim:
  * depth is only a PROXY for decode work, and partition pruning breaks
  * the proxy — a month-deep query on a well-pruned table selects one
  * file and a few KB yet would queue behind the gate (the reference's
  * 2026-08-01 production regression: 255 ms of work waiting 40+ s for a
  * permit). So a scan the depth rule would gate is RELEASED when the
  * work it actually selects — post-pruning file count and bytes, known
  * to the driver from the same listings plan building performs — is
  * under both ceilings. The refinement only ever releases; nothing
  * becomes newly gated, so the admission ceiling is unchanged.
  */
class ScanGate(
    /** Lookbacks deeper than this many micros are wide (reference
      * `timefusion_wide_scan_lookback_hours`). */
    val wideLookbackMicros: Long = 24L * 3600 * 1000000,
    /** Release ceilings for the pruned-work refinement (reference
      * `timefusion_wide_scan_max_files` / `_max_mb`). */
    val maxFiles: Long = 16,
    val maxBytes: Long = 256L << 20,
    /** Concurrent gated actions admitted (the semaphore's permits). */
    val permits: Int = 2,
    /** FAIR-scheduler pool gated jobs run in. Configure weights via
      * `spark.scheduler.allocation.file`; an unconfigured name still
      * isolates wide jobs into their own (default-weight) pool. */
    val widePool: String = "graft_wide",
    /** Stable identity for introspection rows (`graft_stats` keys gate
      * counters by it); defaults to the pool name so co-registered gates
      * don't shift identity when the registration list changes. */
    val name: String = "") {

  /** The label stats rows carry: explicit [[name]], else the pool. */
  def label: String = if (name.nonEmpty) name else widePool

  private val sem = new java.util.concurrent.Semaphore(permits, true)

  private val ctr = scala.collection.mutable.LinkedHashMap(
    "gated" -> 0L, "released_by_work" -> 0L, "throttled" -> 0L,
    "ungated" -> 0L)
  def stats: Map[String, Long] = synchronized(ctr.toMap)
  private def bump(k: String): Unit = synchronized { ctr(k) += 1 }

  /** Does the depth rule fire for this lookback? `None` (no lower time
    * bound) is always deep — nothing prunes, every file decodes. */
  def deeperThanWide(lookbackMicros: Option[Long]): Boolean =
    lookbackMicros.forall(_ > wideLookbackMicros)

  /** Admission decision for a scan of `table` bounded below by
    * `now - lookback`: gated when deeper than the wide threshold AND the
    * pruned work it selects exceeds a ceiling. */
  def isWide(table: GraftTable, lookbackMicros: Option[Long]): Boolean = {
    if (!deeperThanWide(lookbackMicros)) return false
    val sinceDate = lookbackMicros match {
      case None => java.time.LocalDate.MIN
      case Some(lb) =>
        java.time.LocalDateTime.ofEpochSecond(
          (GraftClock.nowMicros - lb) / 1000000, 0,
          java.time.ZoneOffset.UTC).toLocalDate
    }
    val (files, bytes) = table.selectedFileWork(sinceDate)
    val small = files <= maxFiles && bytes <= maxBytes
    if (small) bump("released_by_work")
    !small
  }

  /** Run `body` (a Spark ACTION — collect/write/count) under the gate:
    * wide work waits for a permit and executes in [[widePool]]; narrow
    * work runs untouched. The pool property is thread-local to the
    * submitting thread, exactly the scope of the jobs `body` submits,
    * and is restored on exit either way. */
  def run[T](spark: SparkSession, wide: Boolean)(body: => T): T = {
    if (!wide) { bump("ungated"); return body }
    if (!sem.tryAcquire()) { bump("throttled"); sem.acquire() }
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", widePool)
    bump("gated")
    try body
    finally {
      sc.setLocalProperty("spark.scheduler.pool", prev)
      sem.release()
    }
  }

  /** Convenience: classify + gate in one call. */
  def gated[T](table: GraftTable, lookbackMicros: Option[Long])(
      body: => T): T =
    run(table.spark, isWide(table, lookbackMicros))(body)
}
