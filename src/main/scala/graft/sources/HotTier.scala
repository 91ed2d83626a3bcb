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
  * persisted DataFrame: the resolved view restricted to a retention
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
  *  - **Multiple retention windows** (`hot_tier.rs:299-738` demotes per
  *    bucket): one slice per configured retention, and a read is served
  *    by the NARROWEST slice that covers its lookback — a 6 h dashboard
  *    and a 48 h dashboard each hit their own slice, so the 6 h read
  *    never scans 48 h of cached rows. Narrower slices are built FROM the
  *    widest persisted slice (a subset by construction), so extra windows
  *    cost a cached-scan filter, not another parquet read.
  *  - **Lookback gate** (`hot_tier.rs:171-201`): a scan reaching deeper
  *    than `lookbackWindows × max-retention` skips the tier entirely —
  *    the hot leg would shave a sliver off a scan already dominated by
  *    the cold bulk. The threshold is a MULTIPLE of the window, not the
  *    window itself, so a "last 6h" dashboard against 6h retention
  *    (whose lookback lands a few micros over the window by the time the
  *    scan plans) still qualifies. An UNbounded lookback always skips;
  *    retention 0 with no extra windows (tier off) rejects everything.
  *  - **DML invalidation**: a hot slice is an immutable snapshot of one
  *    committed version; ANY table mutation (append, update, compaction)
  *    drops every slice wholesale — the reference's "demoted file is a
  *    pre-DML snapshot" rule. Staleness is checked on EVERY read,
  *    including deep/unbounded ones that skip the tier, so an
  *    invalidated slice's storage unpins promptly instead of riding
  *    until the next in-window read or demotion.
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
  * Locking: [[demote]] materializes the slice (a Spark job, potentially
  * seconds) OUTSIDE the tier monitor — it snapshots the version/cutoff
  * under the lock, builds and counts unlocked, then re-takes the lock
  * and installs only if the snapshot version is still current (a build
  * raced by DML counts as a wasted build, which is exactly what it is).
  * Concurrent [[read]]s therefore never stall behind an in-flight
  * demotion; at worst they serve cold, which is always correct.
  *
  * Accounting simplification, deliberate: `hot_served` (and the
  * slice-level served count that feeds waste conviction) increments when
  * the serving DataFrame is HANDED OUT, not when its plan executes — the
  * reference accounts at scan execution. A caller that builds but never
  * runs the plan still marks the slice as read; at the tier's one-table
  * scope the planned-but-never-run frame is not a real workload shape,
  * and a plan-time count keeps the read path free of listener plumbing.
  *
  * Reads through the tier are always CORRECT regardless of policy state:
  * every path resolves the same merge-on-read view; the tier only
  * chooses which physical plan serves it.
  */
class HotTier(
    val table: GraftTable,
    /** Event-time width of the primary hot slice in micros; 0 (with no
      * [[extraRetentions]]) disables the tier. */
    val retentionMicros: Long,
    /** Additional retention windows, each pinned as its own slice — the
      * reference's per-bucket demotion granularity. */
    val extraRetentions: Seq[Long] = Nil,
    /** How many of the WIDEST retention windows deep a scan may reach and
      * still consult the tier (reference `LOOKBACK_WINDOWS = 2`). */
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
    val maxHotRows: Long = 10000000L,
    /** Partitions a pinned slice is compacted to at build time. The
      * resolved view's dedup window leaves shuffle-partition-count
      * partitions behind; serving a dashboard slice through dozens of
      * mostly-empty cached partitions pays task-scheduling overhead per
      * read. Demotion eats one repartition (off the read path — the
      * reference likewise pays at demotion to mmap ONE IPC file per
      * bucket) so every in-window read schedules a handful of tasks. */
    val slicePartitions: Int = 8) {

  private val tsCol = table.meta.timeColumn

  /** Active retention windows, widest first. */
  private val retentions: Seq[Long] =
    (retentionMicros +: extraRetentions).filter(_ > 0).distinct
      .sorted(Ordering[Long].reverse)

  private final class Slice(val version: Int, val cutoff: Long,
      val df: DataFrame) { var served = 0L }

  // pinned slices keyed by retention window (each snapshots one version)
  private var built: Map[Long, Slice] = Map.empty

  // suppression state (per-table in the reference; a HotTier wraps one table)
  private var windowBuilds = 0
  private var windowWasted = 0
  private var probeSize = probeBuilds
  private var suppressedUntil = 0L

  // serializes demotions (the flush cadence is single-writer anyway);
  // `this` guards only the quick state reads/writes, never a Spark job
  private val demoteLock = new Object

  // observability counters (the reference exposes these via timefusion_stats)
  private val ctr = scala.collection.mutable.LinkedHashMap(
    "builds" -> 0L, "wasted_builds" -> 0L, "hot_served" -> 0L,
    "cold_served" -> 0L, "suppressions" -> 0L, "oversize_skips" -> 0L,
    "suppressed_skips" -> 0L)
  def stats: Map[String, Long] = synchronized {
    ctr.toMap +
      ("suppressed" -> (if (suppressed(GraftClock.nowMicros)) 1L else 0L)) +
      ("slices" -> built.size.toLong)
  }

  /** Must a scan reaching `lookbackMicros` into the past skip the hot leg?
    * `None` = unbounded = always skip; tier off (no retentions) skips all. */
  def skipForLookback(lookbackMicros: Option[Long]): Boolean =
    lookbackMicros.forall(d =>
      retentions.isEmpty || d > retentions.head * lookbackWindows)

  private def suppressed(now: Long): Boolean = now < suppressedUntil

  private def tsLit(micros: Long) =
    expr(s"cast(timestamp_micros(${micros}L) as timestamp_ntz)")

  /** Write-path population hook: pin the current version's retention
    * window(s). Call after a flush/commit (e.g. on the streaming-ingest
    * cadence, next to the maintenance sweep). No-ops when the tier is
    * off, every slice is already current, or the table is under a waste
    * conviction. Returns true when at least one new slice was pinned. */
  def demote(): Boolean = demoteLock.synchronized {
    if (retentions.isEmpty) return false
    val now = GraftClock.nowMicros
    val v = table.currentVersion()
    // snapshot + policy decisions under the monitor; NO Spark job yet
    val missing: Seq[Long] = synchronized {
      invalidateIfStale(v)
      convictIfWasteful(now)
      if (suppressed(now)) { ctr("suppressed_skips") += 1; return false }
      retentions.filterNot(built.contains)
    }
    if (missing.isEmpty) return false // already current

    // materialize OUTSIDE the monitor — reads proceed (cold) meanwhile.
    // Widest window first; narrower windows filter the widest persisted
    // frame instead of re-reading parquet (subset by construction) —
    // including a widest slice ALREADY pinned for this version (its
    // staleness was just checked under the monitor).
    var widest: Option[(Long, DataFrame)] = // (cutoff, frame)
      synchronized(built.values.toSeq.sortBy(_.cutoff).headOption
        .map(s => (s.cutoff, s.df)))
    var staged = List.empty[(Long, Long, DataFrame, Long)] // (ret, cutoff, df, n)
    missing.sorted(Ordering[Long].reverse).foreach { ret =>
      val cutoff = now - ret
      val src = widest match {
        case Some((wc, wdf)) if wc <= cutoff => wdf
        case _ => table.readResolved()
      }
      val df = src.filter(col(tsCol) >= tsLit(cutoff))
        .repartition(math.max(1, slicePartitions))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = df.count() // materializes the slice
      if (n > maxHotRows) {
        df.unpersist(blocking = false)
        synchronized {
          windowBuilds += 1; ctr("builds") += 1
          // an oversize build never pays off; it counts toward waste
          windowWasted += 1
          ctr("oversize_skips") += 1; ctr("wasted_builds") += 1
        }
      } else {
        if (widest.forall(_._1 > cutoff)) widest = Some((cutoff, df))
        staged ::= ((ret, cutoff, df, n))
      }
    }
    if (staged.isEmpty) return false

    // install under the monitor, but only if the snapshot is still the
    // table's current version — a DML that landed during the build makes
    // every staged slice a pre-DML snapshot (dead on arrival)
    val stillCurrent = table.currentVersion() == v
    synchronized {
      staged.foreach { case (ret, cutoff, df, _) =>
        windowBuilds += 1; ctr("builds") += 1
        if (stillCurrent) built += ret -> new Slice(v, cutoff, df)
        else {
          df.unpersist(blocking = false)
          windowWasted += 1; ctr("wasted_builds") += 1
        }
      }
    }
    stillCurrent
  }

  /** The resolved view of rows with event time in `[now - lookback, ∞)`
    * (full view when `lookbackMicros` is None), served through the
    * NARROWEST pinned slice that covers the lookback when the gate allows
    * one; the cold resolved scan otherwise. A lookback deeper than every
    * slice (but inside the gate) unions the widest slice with a cold gap
    * leg whose date filter stays strictly below the slice cutoff, so its
    * partitions prune to the gap the slice doesn't cover. */
  def read(lookbackMicros: Option[Long]): DataFrame = synchronized {
    val now = GraftClock.nowMicros
    val since = lookbackMicros.map(now - _)
    def cold: DataFrame = {
      ctr("cold_served") += 1
      since.map(s => table.readResolved().filter(col(tsCol) >= tsLit(s)))
        .getOrElse(table.readResolved())
    }
    // staleness check BEFORE the lookback early-return: a deep/unbounded
    // read must still unpin a DML-invalidated slice, or its persisted
    // storage rides until the next demotion despite being unservable
    if (built.nonEmpty) invalidateIfStale(table.currentVersion())
    if (skipForLookback(lookbackMicros)) return cold
    if (built.isEmpty) return cold
    val s = since.get // gate guarantees a bounded lookback here
    // narrowest covering slice = the LARGEST cutoff still ≤ since
    built.values.filter(_.cutoff <= s).toSeq.sortBy(-_.cutoff).headOption match {
      case Some(sl) =>
        sl.served += 1
        ctr("hot_served") += 1
        // at exactly the slice's cutoff the filter admits every row —
        // serve the cached frame bare so the plan is a pure InMemory scan
        if (s == sl.cutoff) sl.df
        else sl.df.filter(col(tsCol) >= tsLit(s))
      case None =>
        // deeper than every slice: widest slice + cold gap leg
        val sl = built.values.toSeq.minBy(_.cutoff)
        sl.served += 1
        ctr("hot_served") += 1
        val gap = table.readResolved()
          .filter(col(tsCol) >= tsLit(s) && col(tsCol) < tsLit(sl.cutoff))
        gap.unionByName(sl.df)
    }
  }

  private def invalidateIfStale(v: Int): Unit = {
    val (live, dead) = built.partition(_._2.version == v)
    dead.values.foreach { sl =>
      sl.df.unpersist(blocking = false)
      if (sl.served == 0) { windowWasted += 1; ctr("wasted_builds") += 1 }
    }
    built = live
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

  /** Drop every pinned slice (shutdown / external memory pressure). */
  def release(): Unit = synchronized {
    built.values.foreach(_.df.unpersist(blocking = false))
    built = Map.empty
  }
}
