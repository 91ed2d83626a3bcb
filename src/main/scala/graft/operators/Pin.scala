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
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.reliableCheckpoints").exists(_.toBoolean))
      df.checkpoint()
    else df.localCheckpoint()
}
