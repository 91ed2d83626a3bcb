package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Shared probe plumbing for every probe-side index — the LSM pair
  * ([[AnnIngestIndex]], [[TextIngestIndex]]) via [[LsmSegmentIndex]] and
  * the frozen [[ContainmentBenchIndex]] alike (VERDICT r13 what's-wrong
  * #2: the bench index set its private pushed flag directly and its
  * probes were invisible in the bench record's `ingest_index` block —
  * the exact "silently always-fallback looks correct and scales badly"
  * blind spot the counters exist to close). Owns:
  *  - the bounded driver-side key collect behind the pushed-In path;
  *  - the per-instance and process-wide pushed-vs-fallback counters
  *    (bench artifacts emit the process totals). */
private[graft] trait IndexProbePlumbing {

  // introspection for specs: did the last probe use the pushed-In path?
  @volatile private[graft] var lastProbePushedKeys = false
  private var probePushed = 0L
  private var probeFallback = 0L

  /** Collect up to `bound`+1 distinct values of `c` — the caller pushes
    * an In literal iff the result stayed within `bound` (one extra row
    * distinguishes "exactly at the bound" from "over it"). */
  protected final def collectBounded(df: DataFrame, c: String,
      bound: Int): Array[Row] =
    df.select(c).distinct().limit(bound + 1).collect()

  /** Record which path a real probe took; feeds the per-instance and
    * process-wide counters (bench artifacts emit the latter). */
  protected final def recordProbePath(pushed: Boolean): Unit = synchronized {
    lastProbePushedKeys = pushed
    if (pushed) { probePushed += 1; LsmSegmentIndex.pushedTotal.incrementAndGet() }
    else { probeFallback += 1; LsmSegmentIndex.fallbackTotal.incrementAndGet() }
  }

  /** (probes that pushed a key literal, probes that fell back to the
    * join-only scan) for THIS index instance. */
  final def probePathCounts: (Long, Long) =
    synchronized((probePushed, probeFallback))
}

/** Shared LSM segment-registry core for the ingest-side indexes
  * ([[AnnIngestIndex]] for vectors, [[TextIngestIndex]] for exact
  * Jaccard). Both maintain committed dedup survivors as key-sorted
  * parquet segments merged binary-counter style; everything that is not
  * the payload layout lives here so the two cannot drift (the r12 round
  * shipped tombstones on one index and not the other — exactly the
  * hazard this base removes). Reference analogue: the tantivy sidecar's
  * segment registry + merge policy (`docs/ARCHITECTURE.md` text-index
  * section) re-expressed over parquet + DataFrame scans.
  *
  * Owned here:
  *  - the segment registry (newest-first, sizes increasing tail-ward)
  *    and the binary-counter merge loop: an add absorbs every resident
  *    segment no larger than itself, so a long drain keeps
  *    ≤ log₂(batches) segments and each row is rewritten at most
  *    log₂(batches) times;
  *  - the COMMIT PROTOCOL: every segment directory is committed by an
  *    atomically-renamed `_commit` manifest listing the directories the
  *    write absorbed. A segment without `_commit` is a mid-write crash
  *    and is deleted at adoption (the stream checkpoint replays its
  *    batch); a segment whose manifest lists still-existing directories
  *    crashed BETWEEN commit and cleanup, and adoption finishes the
  *    cleanup instead of double-indexing every absorbed row;
  *  - restart adoption from the directory listing (sizes from footer
  *    counts), including the tombstone set;
  *  - DML tombstones: [[tombstoneIds]] durably records deleted survivor
  *    ids; every segment WRITE anti-joins them out (so merges compact
  *    dead rows physically and a tombstoned id can never re-enter),
  *    probes hide them via [[antiTombstoned]], and a FULL merge — one
  *    that absorbed every resident segment — clears the set entirely
  *    (nothing it could refer to survives), which bounds the tombstone
  *    set by the ids removed since the last full merge instead of the
  *    stream's lifetime;
  *  - the bounded driver-side key collect behind the pushed-In probe
  *    path, and the pushed-vs-fallback counters (a config that silently
  *    always falls back looks correct and scales badly — the counters
  *    make it observable in bench artifacts). */
private[streaming] abstract class LsmSegmentIndex(
    protected val spark: SparkSession, protected val root: String)
  extends IndexProbePlumbing {

  /** Column name carrying the committed survivor id inside segment rows
    * — the merge-time compaction anti-join and the tombstone store key
    * on it. */
  protected def segmentIdCol: String

  /** Write one committed segment's payload at `dir` from the merged
    * rows; `n` is the (pre-compaction) row count for file sizing. */
  protected def writeSegmentPayload(frame: DataFrame, dir: String,
      n: Long): Unit

  /** The rows a merge re-ingests from a committed segment — must carry
    * [[segmentIdCol]] and union-compatibly match what adds feed
    * [[foldIn]]. */
  protected def readSegmentRows(dir: String): DataFrame

  /** Footer-count of a committed segment (registry sizes; a metadata
    * read, no data scan). */
  protected def segmentRowCount(dir: String): Long

  // newest-first (segment dir, row count); sizes increase tail-ward
  private var segments: List[(String, Long)] = Nil
  private var segSeq = 0
  private var rowsWrittenTotal = 0L
  // pinned tombstoned ids (one column named segmentIdCol); None = empty.
  // Maintained as a lazy union of per-remove pinned fragments — O(batch)
  // per remove, never a re-distinct of the whole set; duplicate ids are
  // harmless to the anti-joins and the set clears at every full merge.
  private var tombstones: Option[DataFrame] = None

  protected final def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tombDir = new Path(new Path(root), "_tombstones")

  // ---- restart recovery --------------------------------------------------
  /** Adopt what a predecessor left on disk. Called at the END of the
    * subclass constructor (it needs the payload readers). */
  protected final def adoptExisting(): Unit = synchronized {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return
    val segs = fs.listStatus(rootPath).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("seg_"))
    if (segs.nonEmpty)
      segSeq = segs.map(_.getName.stripPrefix("seg_").toInt).max + 1
    // finish interrupted merge cleanups FIRST: every committed
    // manifest's absorbed list names directories whose rows the
    // committed segment already contains — adopting BOTH would index
    // every absorbed row twice forever. Collect manifests from ALL
    // committed segments (a doubly-interrupted chain resolves
    // transitively: the absorbed dir's own manifest is read before the
    // dir is deleted), and drop absorbed dirs whether or not they carry
    // their own commit (a legacy dir can be absorbed too).
    val withCommit = segs.filter(p => fs.exists(new Path(p, "_commit"))).toSet
    val absorbedNames = withCommit.flatMap(readManifest)
    val (dead, live) = segs.partition(p => absorbedNames.contains(p.getName))
    dead.foreach(fs.delete(_, true))
    // per-survivor adoption verdict via [[adoptSegment]]: committed
    // current-layout segments adopt as-is; a `_commit`-less segment is
    // EITHER a mid-write crash (deleted — the stream checkpoint replays
    // its batch) OR a legacy segment from before the commit protocol
    // (ADVICE r13 medium: those were committed by `_SUCCESS` markers
    // only, and wiping them would silently empty the whole committed
    // base on the first restart after an upgrade) — the subclass, which
    // owns the payload layout, decides completeness and may migrate the
    // payload to the current layout under a fresh committed dir.
    val adopted = live.flatMap { p =>
      val kept = adoptSegment(p, withCommit.contains(p))
      if (kept.isEmpty) fs.delete(p, true)
      kept
    }
    if (adopted.nonEmpty) {
      // smallest-first head-ward: the binary-counter invariant (sizes
      // increase tail-ward) holds for the adopted list
      segments = adopted.toList
        .map(p => (p.toString, segmentRowCount(p.toString)))
        .sortBy(_._2)
    }
    if (fs.exists(tombDir) && fs.listStatus(tombDir).exists(f =>
        f.getPath.getName.endsWith(".parquet") ||
          f.getPath.getName == "_SUCCESS")) {
      val t = spark.read.parquet(tombDir.toString)
      tombstones = Some(graft.operators.Pin(
        t.select(col(t.columns.head).as(segmentIdCol))))
    }
  }

  /** Adoption verdict for one surviving segment dir: `Some(dir)` adopts
    * (possibly a DIFFERENT dir, when the subclass migrated the payload),
    * `None` deletes. The default trusts only the commit protocol;
    * subclasses override to recognize legacy-complete payloads (written
    * before `_commit` existed — `_SUCCESS`-committed only) and either
    * stamp them with an empty manifest in place or rewrite them into the
    * current layout via [[nextSegDir]] + [[commitSegment]]. */
  protected def adoptSegment(dir: Path, committed: Boolean): Option[Path] =
    if (committed) Some(dir) else None

  /** Allocate the next segment directory name (caller writes + commits). */
  protected final def nextSegDir(): String = {
    val d = f"$root/seg_$segSeq%06d"
    segSeq += 1
    d
  }

  private def readManifest(p: Path): Seq[String] = {
    val m = new Path(p, "_commit")
    val in = fs.open(m)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `dir` atomically: write the absorbed-directory manifest to a
    * temp name, then rename — the rename is the commit point, so a
    * segment is either invisible (no `_commit`, deleted at adoption) or
    * complete WITH its cleanup obligations on record. */
  protected final def commitSegment(dir: String,
      absorbed: List[String]): Unit = {
    val tmp = new Path(dir, "_commit.tmp")
    val out = fs.create(tmp, true)
    try out.write(absorbed.map(d => new Path(d).getName)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, "_commit")))
      throw new java.io.IOException(s"commit rename failed for $dir")
  }

  // ---- maintenance ---------------------------------------------------------
  /** Fold `n0` pinned rows into the index: binary-counter absorb, write
    * one committed segment, clean up. Every write anti-joins the
    * tombstone set (merges compact dead rows physically; a tombstoned id
    * cannot re-enter through a fresh add), and a FULL merge clears the
    * set. Returns the rows processed through this write (batch + merge
    * rewrite — the amortized maintenance quantity). */
  protected final def foldIn(rows: DataFrame, n0: Long): Long = synchronized {
    var n = n0
    var frame = rows
    var absorbed = List.empty[String]
    while (segments.nonEmpty && segments.head._2 <= n) {
      val (dir, m) = segments.head
      segments = segments.tail
      n += m
      absorbed ::= dir
      frame = frame.unionByName(readSegmentRows(dir))
    }
    val fullMerge = segments.isEmpty // every resident segment absorbed
    tombstones.foreach { t =>
      frame = frame.join(broadcast(t), Seq(segmentIdCol), "left_anti")
    }
    val dir = nextSegDir()
    writeSegmentPayload(frame, dir, n)
    commitSegment(dir, absorbed)
    absorbed.foreach(d => fs.delete(new Path(d), true))
    // registry sizes steer the binary counter, so they must reflect the
    // post-compaction disk state; the maintenance counter records the
    // rows this add actually processed (pre-compaction union)
    val size = if (tombstones.isDefined) segmentRowCount(dir) else n
    if (fullMerge && tombstones.isDefined) {
      // nothing outside the just-written segment survives, and that
      // segment was written through the anti-join — the tombstone set
      // has nothing left to refer to
      fs.delete(tombDir, true)
      tombstones = None
    }
    segments = (dir, size) :: segments
    rowsWrittenTotal += n
    n
  }

  /** Durably tombstone survivor ids (one-column frame; any name).
    * Idempotent — removing an id twice, or an id never indexed, is a
    * no-op on probe results. */
  protected final def tombstoneIds(ids: DataFrame): Unit = synchronized {
    require(ids.columns.length == 1,
      s"tombstone frame must carry exactly one id column, " +
        s"got ${ids.columns.mkString(",")}")
    val t = graft.operators.Pin(
      ids.select(col(ids.columns.head).as(segmentIdCol)).distinct())
    // append durably FIRST (restart adopts), then extend the pinned view
    t.write.mode("append").parquet(tombDir.toString)
    tombstones = Some(tombstones match {
      case Some(prev) => prev.unionByName(t)
      case None => t
    })
  }

  protected final def hasTombstones: Boolean = synchronized(tombstones.isDefined)

  /** Hide tombstoned survivors from a probe-side frame keyed by `on`. */
  protected final def antiTombstoned(df: DataFrame, on: String): DataFrame =
    synchronized(tombstones) match {
      case Some(t) => df.join(
        broadcast(t.select(col(segmentIdCol).as(on))), Seq(on), "left_anti")
      case None => df
    }

  // ---- probe plumbing ------------------------------------------------------
  /** Resident segment directories, newest first (empty = empty index). */
  protected final def residentSegmentDirs: List[String] =
    synchronized(segments.map(_._1))

  // ---- introspection -------------------------------------------------------
  /** Resident segment count — ≤ log₂(batches)+1 under equal-sized adds. */
  final def segmentCount: Int = synchronized(segments.length)

  /** Rows currently indexed across resident segments. */
  protected final def indexedTotal: Long = synchronized(segments.map(_._2).sum)

  /** Total rows ever processed through segment writes (adds + merge
    * rewrites) — the amortized O(rows · log batches) quantity. */
  protected final def writtenTotal: Long = synchronized(rowsWrittenTotal)

  /** Rows in the pinned tombstone set's lineage — for specs pinning the
    * full-merge clearing (bounded by removes since the last full merge,
    * not stream lifetime). */
  private[graft] final def tombstoneRows: Long =
    synchronized(tombstones.map(_.count()).getOrElse(0L))
}

private[graft] object LsmSegmentIndex {
  /** Process-wide pushed-vs-fallback probe counters across every live
    * index — bench artifacts emit these next to the scan_gate/hot_tier
    * blocks so an always-fallback configuration is visible. */
  val pushedTotal = new java.util.concurrent.atomic.AtomicLong
  val fallbackTotal = new java.util.concurrent.atomic.AtomicLong
}
