package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-(session, sf-dir, view) persisted-frame registry — the code-level
  * analogue of the reference's `data.*_v` materialized view layer
  * (e.g. `data.cloudtrail_v`, `snowflake.login_history_v`): a pack of N
  * rules reads one projected/derived frame N times per run, so the
  * per-row JSON extraction and column derivation are computed once and
  * the other N-1 consumers are served from the persisted columnar form.
  * MEMORY_AND_DISK so a large SF spills instead of OOMing; the
  * cluster-scale analog is writing the projected view to parquet once
  * per collection cycle.
  *
  * A weak-keyed map would never evict here — a cached DataFrame strongly
  * references its own SparkSession, pinning the key — so the registry
  * instead drops entries for stopped sessions on every lookup (the
  * persisted blocks died with the session's context; only the stale map
  * entries need collecting). Bounded: a JVM holds a handful of
  * (session, dir, view) triples.
  */
object SharedFrames {
  private val shared = scala.collection.mutable.Map[
    (SparkSession, String, String), DataFrame]()

  /** Returns the persisted frame for (spark, dir, view), building and
    * persisting it via `build` on first use. */
  def get(spark: SparkSession, dir: String, view: String)(
      build: => DataFrame): DataFrame =
    shared.synchronized {
      shared.filterInPlace { case ((s, _, _), _) =>
        !s.sparkContext.isStopped
      }
      shared.getOrElseUpdate((spark, dir, view), {
        val df = build
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df
      })
    }
}
