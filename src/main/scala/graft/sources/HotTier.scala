package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftClock

/** S5: the hot tier — a fast-path serving layer for recent data
  * (reference `/root/reference/src/hot_tier.rs`, 1856 LoC), re-expressed
  * for Spark's execution model.
  *
  * The reference demotes freshly-flushed parquet into mmap'd Arrow-IPC
  * files on local NVMe and splices them into the scan as a `MemorySource`
  * leg, so dashboard-width queries never touch the object store. Spark's
  * native analogue of "recent slice pinned in fast storage" is a
  * persisted DataFrame: the resolved view restricted to the retention
  * window, materialized by the write path with `MEMORY_AND_DISK`, serving
  * every in-window read without commit listing, parquet IO, or the dedup
  * window. What carries over from the reference is not the storage medium
  * but the *policy* layer, which is where all the hard-won semantics live:
  *
  *  - **Write-side population** ([[demote]]): the tier is fed by the
  *    flush/commit path, never by queries — exactly the reference's
  *    demotion-rides-the-flush model. A read finding no valid slice
  *    falls through to the cold scan; it never builds one itself. This
  *    is what makes the waste accounting below meaningful: a slice CAN
  *    die without ever serving a query.
  *  - **Lookback gate** (`hot_tier.rs:171-201`): a scan reaching deeper
  *    than `lookbackWindows × retention` skips the tier entirely — the
  *    hot leg would shave a sliver off a scan already dominated by the
  *    cold bulk. The threshold is a MULTIPLE of the window, not the
  *    window itself, so a "last 6h" dashboard against 6h retention
  *    (whose lookback lands a few micros over the window by the time the
  *    scan plans) still qualifies. An UNbounded lookback always skips;
  *    retention 0 (tier off) rejects everything.
  *  - **DML invalidation**: a hot slice is an immutable snapshot of one
  *    committed version; ANY table mutation (append, update, compaction)
  *    drops it wholesale — the reference's "demoted file is a pre-DML
  *    snapshot" rule.
  *  - **Adaptive suppression** (`hot_tier.rs:115-157`): under a workload
  *    that rewrites the table continuously, demotion builds slices that
  *    are invalidated before any query reads them — pure waste that
  *    looks healthy from the outside. Each table is judged on its own
  *    builds: once `probeBuilds` builds accumulate and ≥ `wastePct`% of
  *    them died unread, demotion stops for `cooldownMicros` (reads fall
  *    through to the cold path; correctness unaffected). After the
  *    cooldown the re-probe is a single build — re-testing is cheap, so
  *    a table whose churn stopped recovers immediately, with no restart
  *    and no config.
  *  - **Budget ceiling** (`HotTierLimits`): a slice that materializes
  *    over `maxHotRows` is dropped rather than pinned — the reference's
  *    `leg_budget_bytes`, expressed in rows because Spark's persisted
  *    size is only known post-materialization.
  *
  * Reads through the tier are always CORRECT regardless of policy state:
  * every path resolves the same merge-on-read view; the tier only
  * chooses which physical plan serves it.
  */
class HotTier(
    val table: GraftTable,
    /** Event-time width of the hot slice in micros; 0 disables the tier. */
    val retentionMicros: Long,
    /** How many retention windows deep a scan may reach and still consult
      * the tier (reference `LOOKBACK_WINDOWS = 2`). */
    val lookbackWindows: Long = 2L,
    /** Builds before the first waste conviction (reference
      * `PROBE_DEMOTES = 4`): one unlucky DML must not cost a healthy
      * table its tier. */
    val probeBuilds: Int = 4,
    /** Probe size after a conviction (reference `REPROBE_DEMOTES = 1`). */
    val reprobeBuilds: Int = 1,
    /** Share of a probe's builds that must die unread to convict
      * (reference `WASTE_PCT = 75`). */
    val wastePct: Int = 75,
    /** How long a convicted table stops building (reference
      * `SUPPRESSION_COOLDOWN` = 30 min). */
    val cooldownMicros: Long = 30L * 60 * 1000000,
    /** Row ceiling for one pinned slice (`leg_budget_bytes` analogue). */
    val maxHotRows: Long = 10000000L) {

  private val tsCol = table.meta.timeColumn

  // one pinned slice per tier: (version it snapshots, event-time cutoff
  // it covers from, the persisted frame)
  private var built: Option[(Int, Long, DataFrame)] = None
  private var servedSinceBuild = 0L

  // suppression state (per-table in the reference; a HotTier wraps one table)
  private var windowBuilds = 0
  private var windowWasted = 0
  private var probeSize = probeBuilds
  private var suppressedUntil = 0L

  // observability counters (the reference exposes these via timefusion_stats)
  private val ctr = scala.collection.mutable.LinkedHashMap(
    "builds" -> 0L, "wasted_builds" -> 0L, "hot_served" -> 0L,
    "cold_served" -> 0L, "suppressions" -> 0L, "oversize_skips" -> 0L,
    "suppressed_skips" -> 0L)
  def stats: Map[String, Long] = synchronized {
    ctr.toMap + ("suppressed" -> (if (suppressed(GraftClock.nowMicros)) 1L else 0L))
  }

  /** Must a scan reaching `lookbackMicros` into the past skip the hot leg?
    * `None` = unbounded = always skip; tier off (retention 0) skips all. */
  def skipForLookback(lookbackMicros: Option[Long]): Boolean =
    lookbackMicros.forall(d =>
      retentionMicros <= 0 || d > retentionMicros * lookbackWindows)

  private def suppressed(now: Long): Boolean = now < suppressedUntil

  private def tsLit(micros: Long) =
    expr(s"cast(timestamp_micros(${micros}L) as timestamp_ntz)")

  /** Write-path population hook: pin the current version's retention
    * window. Call after a flush/commit (e.g. on the streaming-ingest
    * cadence, next to the maintenance sweep). No-ops when the tier is
    * off, the slice is already current, or the table is under a waste
    * conviction. Returns true when a new slice was pinned. */
  def demote(): Boolean = synchronized {
    if (retentionMicros <= 0) return false
    val now = GraftClock.nowMicros
    val v = table.currentVersion()
    invalidateIfStale(v)
    convictIfWasteful(now)
    if (suppressed(now)) { ctr("suppressed_skips") += 1; return false }
    if (built.isDefined) return false // already current
    val cutoff = now - retentionMicros
    val df = table.readResolved().filter(col(tsCol) >= tsLit(cutoff))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = df.count() // materializes the slice
    windowBuilds += 1
    ctr("builds") += 1
    if (n > maxHotRows) {
      df.unpersist(blocking = false)
      ctr("oversize_skips") += 1
      // an oversize build never pays off; it counts toward waste
      windowWasted += 1; ctr("wasted_builds") += 1
      false
    } else {
      built = Some((v, cutoff, df))
      servedSinceBuild = 0
      true
    }
  }

  /** The resolved view of rows with event time in `[now - lookback, ∞)`
    * (full view when `lookbackMicros` is None), served through the hot
    * slice when the gate allows and a current slice exists; the cold
    * resolved scan otherwise. The union split for lookbacks deeper than
    * the slice (but inside the gate) keeps the cold leg's date filter
    * strictly below the hot cutoff, so its partitions prune to the gap
    * the slice doesn't cover. */
  def read(lookbackMicros: Option[Long]): DataFrame = synchronized {
    val now = GraftClock.nowMicros
    val since = lookbackMicros.map(now - _)
    def cold: DataFrame = {
      ctr("cold_served") += 1
      since.map(s => table.readResolved().filter(col(tsCol) >= tsLit(s)))
        .getOrElse(table.readResolved())
    }
    if (skipForLookback(lookbackMicros)) return cold
    invalidateIfStale(table.currentVersion())
    built match {
      case None => cold
      case Some((_, cutoff, hot)) =>
        servedSinceBuild += 1
        ctr("hot_served") += 1
        val s = since.get // gate guarantees a bounded lookback here
        // at exactly the slice's cutoff the filter admits every row —
        // serve the cached frame bare so the plan is a pure InMemory scan
        if (s == cutoff) hot
        else if (s > cutoff) hot.filter(col(tsCol) >= tsLit(s))
        else {
          // gap leg: [since, cutoff) off the cold scan — prunes to the
          // few partitions the slice doesn't cover — plus the slice
          val gap = table.readResolved()
            .filter(col(tsCol) >= tsLit(s) && col(tsCol) < tsLit(cutoff))
          gap.unionByName(hot)
        }
    }
  }

  private def invalidateIfStale(v: Int): Unit = built match {
    case Some((bv, _, df)) if bv != v =>
      df.unpersist(blocking = false)
      built = None
      if (servedSinceBuild == 0) { windowWasted += 1; ctr("wasted_builds") += 1 }
      servedSinceBuild = 0
    case _ => ()
  }

  private def convictIfWasteful(now: Long): Unit =
    if (windowBuilds >= probeSize) {
      if (windowWasted * 100L >= wastePct.toLong * windowBuilds) {
        suppressedUntil = now + cooldownMicros
        ctr("suppressions") += 1
        probeSize = reprobeBuilds // re-probe with a single cheap build
      }
      // lifting/convicting resets the window either way: the next probe is
      // judged only on what the table does from here
      windowBuilds = 0; windowWasted = 0
    }

  /** Drop the pinned slice (shutdown / external memory pressure). */
  def release(): Unit = synchronized {
    built.foreach(_._3.unpersist(blocking = false))
    built = None
  }
}
