package graft

import org.apache.spark.sql.DataFrame

/** Materialization point for frames that are consumed more than once and
  * for per-round lineage truncation inside iterative algorithms
  * (connected components, anchored-correlation pointer jumping).
  *
  * Local/default mode uses an eager `localCheckpoint` — blocks live in
  * executor storage, no filesystem round-trip, fastest for local[n] and
  * for short-lived jobs. That is the WRONG durability story for a
  * 1000-executor run: executor-local blocks die with the executor, and an
  * iterative job whose round-k state was on the lost executor aborts.
  * Cluster runs set `spark.graft.checkpointDir` (any HDFS/S3A/ABFS path)
  * and every materialization switches to a RELIABLE `checkpoint` that
  * survives executor loss; lineage is truncated either way.
  */
object Materialize {

  val ConfKey = "spark.graft.checkpointDir"

  /** Materialize `df` eagerly and truncate its lineage. Reliable iff
    * [[ConfKey]] is set on the session. */
  def frame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // getCheckpointDir is the qualified path plus a random UUID
        // subdir, so compare by substring — an equality check would
        // re-mint a checkpoint directory on every call.
        if (!spark.sparkContext.getCheckpointDir.exists(_.contains(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }
}
