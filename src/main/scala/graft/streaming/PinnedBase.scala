package graft.streaming

import org.apache.spark.sql.DataFrame

/** Incrementally-maintained pinned base for ingest-time dedup: the set of
  * already-committed survivors each micro-batch probes against.
  *
  * The naive maintenance — `base = Pin(base.unionByName(keepers))` per
  * batch — re-materializes EVERY base row into fresh checkpoint blocks on
  * every micro-batch: O(batches × base) total pinned rows, the cost that
  * turns a long-running ingest stream quadratic (a 10k-batch drain
  * re-pins the full corpus 10k times). Here each batch pins ONLY its own
  * keepers, and [[current]] unions the pinned fragments lazily — a scan
  * of already-checkpointed blocks, never a recompute.
  *
  * Fragments merge LSM-style (binary counter): an incoming fragment
  * absorbs every resident fragment no larger than itself, so after N
  * same-sized batches the base holds ≤ log₂N + 1 fragments (bounded plan
  * width / scheduling overhead for [[current]]) and each row is re-pinned
  * at most log₂N times over the stream's lifetime — amortized
  * O(log batches) maintenance per row instead of O(batches). The merge
  * discipline is the reference sidecar's incremental segment-add policy
  * (`tantivy` segment merges) applied to checkpointed frames.
  *
  * This is the IN-MEMORY tier of the discipline — right when the
  * consumer needs the whole base as one frame (`current`). When the
  * consumer can probe through key filters instead, the persisted
  * siblings ([[AnnIngestIndex]] for vectors, [[TextIngestIndex]] for
  * exact-Jaccard text — which superseded PinnedBase on the q126 ingest
  * path) keep per-batch PROBE cost batch-sized too, not just the
  * maintenance.
  *
  * Counters expose the maintenance cost for specs and ops: [[pinnedRowsTotal]]
  * is every row ever materialized (adds + merges); [[addPinnedRows]] only
  * the per-batch add cost, which stays flat in base size by construction. */
final class PinnedBase(empty: DataFrame) {

  // newest-first; strictly increasing row counts tail-ward
  private var parts: List[(DataFrame, Long)] = Nil
  private var pinned = 0L
  private var addPinned = 0L

  /** The base as one lazily-unioned frame of pinned fragments. */
  def current: DataFrame = synchronized {
    parts.map(_._1).foldLeft(empty)(_.unionByName(_))
  }

  /** Pin this batch's keepers and fold them into the base. Returns the
    * number of rows materialized by this add (batch + any merged
    * fragments) — the per-batch maintenance cost. */
  def add(keepers: DataFrame): Long = synchronized {
    val p0 = graft.operators.Pin(keepers)
    var n = p0.count()
    addPinned += n
    pinned += n
    if (n == 0) return 0L
    var frame = p0
    var merged = n
    // binary-counter merge: absorb every fragment no larger than the
    // incoming one, so fragment sizes stay geometrically separated
    while (parts.nonEmpty && parts.head._2 <= n) {
      val (f, m) = parts.head
      parts = parts.tail
      n += m
      frame = frame.unionByName(f)
    }
    if (n != merged) { // a merge happened: re-pin the coalesced fragment
      frame = graft.operators.Pin(frame)
      pinned += n
    }
    parts = (frame, n) :: parts
    n
  }

  /** Total rows ever materialized (adds + merge re-pins) — the amortized
    * O(rows · log batches) quantity. */
  def pinnedRowsTotal: Long = synchronized(pinned)

  /** Rows materialized by adds alone — exactly the keeper rows, flat in
    * base size per batch. */
  def addPinnedRows: Long = synchronized(addPinned)

  /** Resident fragment count — ≤ log₂(batches) + 1 for same-sized adds. */
  def fragments: Int = synchronized(parts.length)
}
