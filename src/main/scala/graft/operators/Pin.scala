package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for reused expensive frames (verified pair lists, hashed
  * token sets, quantizer assignments…).
  *
  * Default `localCheckpoint`: executor-memory materialization, no disk
  * round-trip — the right trade for interactive and batch jobs, at the
  * cost that an executor loss kills the job instead of recomputing
  * (acceptable when the job retries wholesale).
  *
  * `spark.graft.reliableCheckpoints=true` (with a
  * `SparkContext.setCheckpointDir` set) routes through reliable
  * `checkpoint()` instead: the pinned frame lands in fault-tolerant
  * storage, so a 1000-executor fleet job survives individual executor
  * loss mid-iteration — the production posture for multi-hour dedup or
  * clustering runs at full corpus scale. */
object Pin {
  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf
      .getOption("spark.graft.reliableCheckpoints").exists(_.toBoolean)

  def apply(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint() else df.localCheckpoint()

  /** LAZY pin (r15): same lineage cut and single-execution guarantee,
    * but the checkpoint materializes inside the FIRST consuming job
    * instead of a dedicated blocking driver round-trip — pin-heavy
    * pipelines (the LM model frames, the LSH keyed frame) paid one
    * serial job per eager pin, pure scheduling latency at gate scale
    * (VERDICT r14 #4/#5).
    *
    * ONLY safe when every consumer FULLY materializes the frame
    * (aggregations, broadcast builds, shuffle/equi joins): a
    * short-circuiting consumer (isEmpty / limit / take) runs a job over
    * a PARTIAL partition set, a later job computes the rest in a
    * separate execution, and a nondeterministic upstream could then
    * break the exactly-once-per-row contract the pin exists to provide
    * (the r14 deferral, narrowed by VERDICT r14 to short-circuiting
    * consumers only — each partition that IS computed persists whole,
    * so full-materializing consumers are exactly the safe set). Keep
    * [[apply]] for frames a greedy/limit-style loop consumes. */
  def lazily(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** [[lazily]] over several INDEPENDENT frames, constructed from
    * parallel driver threads (guide §2.6 — overlap independent jobs).
    * Even a lazy checkpoint materializes its plan's intermediate
    * shuffle stages at construction (AQE's doExecute resolves the final
    * plan eagerly; only the last stage + the persist defer to the first
    * consumer), so N pins built sequentially still serialize N rounds
    * of map-stage jobs. Built concurrently, their stages back-fill each
    * other's idle cores; Spark's scheduler handles multi-threaded job
    * submission natively. Frames must not depend on one another. */
  def lazilyAll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = dfs.map(df => Future(lazily(df)))
    fs.map(Await.result(_, Duration.Inf))
  }
}
