package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One per-stage metadata row, mirroring the reference's run records
  * (src/runners/helpers/db.py record_metadata: QUERY_NAME, START_TIME,
  * END_TIME, DURATION, ROW_COUNT{INSERTED,UPDATED,SUPPRESSED,PASSED},
  * ERROR) that feed the snowalert_query_rule_run_errors-style
  * monitoring rules. */
final case class RunMetadataRow(
    run_id: String,
    query_name: String,
    start_time_ms: Long,
    end_time_ms: Long,
    duration_s: Double,
    inserted: Long,
    updated: Long,
    suppressed: Long,
    passed: Long,
    error: Option[String])

/** Accumulates per-stage run metadata on the driver (metadata is tiny —
  * one row per rule per run — the data-plane work stays distributed;
  * only the final counts come back, exactly like the reference's
  * runner). `toDF` exposes the log as a queryable DataFrame so the
  * reference's monitoring rules (rules over metadata tables) can run on
  * it like on any other source. */
final class RunLog(val runId: String) {
  private val rows = mutable.ArrayBuffer.empty[RunMetadataRow]

  def record(
      queryName: String,
      startMs: Long,
      endMs: Long,
      inserted: Long = 0L,
      updated: Long = 0L,
      suppressed: Long = 0L,
      passed: Long = 0L,
      error: Option[String] = None): Unit = synchronized {
    rows += RunMetadataRow(runId, queryName, startMs, endMs,
      (endMs - startMs) / 1000.0, inserted, updated, suppressed, passed,
      error)
  }

  /** Run an alert/violation rule stage: materializes the stage output
    * count (the INSERTED row count) and wall time. Errors are recorded
    * with zero counts, matching record_metadata's ERROR path, and
    * rethrown. */
  def timedInsert(queryName: String)(stage: => DataFrame): DataFrame = {
    val t0 = System.currentTimeMillis()
    try {
      val df = stage
      val n = df.count()
      record(queryName, t0, System.currentTimeMillis(), inserted = n)
      df
    } catch {
      case e: Exception =>
        record(queryName, t0, System.currentTimeMillis(),
          error = Some(String.valueOf(e.getMessage)))
        throw e
    }
  }

  /** Run a suppression stage: one aggregate action yields both counts —
    * no double scan of the alert set. SUPPRESSED counts only the rows
    * THIS rule matched (suppression_rule == queryName), mirroring the
    * reference runner's per-rule updated-row count; earlier rules' hits
    * are not re-attributed. PASSED is the rows still unsuppressed after
    * this stage. */
  def timedSuppress(queryName: String)(stage: => DataFrame): DataFrame = {
    val t0 = System.currentTimeMillis()
    try {
      val df = stage
      val counts = df.groupBy().agg(
        org.apache.spark.sql.functions.count_if(
          org.apache.spark.sql.functions.col("suppression_rule") ===
            queryName),
        org.apache.spark.sql.functions.count_if(
          !org.apache.spark.sql.functions.col("suppressed"))).head()
      record(queryName, t0, System.currentTimeMillis(),
        suppressed = counts.getLong(0), passed = counts.getLong(1))
      df
    } catch {
      case e: Exception =>
        record(queryName, t0, System.currentTimeMillis(),
          error = Some(String.valueOf(e.getMessage)))
        throw e
    }
  }

  def entries: Seq[RunMetadataRow] = synchronized(rows.toSeq)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }
}

object RunLog {
  def newRun(): RunLog = new RunLog(java.util.UUID.randomUUID().toString)
}
