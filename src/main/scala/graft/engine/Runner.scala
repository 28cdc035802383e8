package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A suppression rule: selects the alert_ids to squelch from the
  * current alert set (ref: alert_suppressions_runner.py — each rule is
  * a SELECT of alert ids; matched alerts are flagged with the rule
  * name, the rest marked not-suppressed). */
final case class SuppressionRule(
    name: String,
    selectIds: DataFrame => DataFrame)

final case class RunConfig(
    fromTs: String,
    toTsExclusive: String,
    alertTimeS: Long,
    correlationGapMinutes: Int = 60,
    defaultHandler: String = "console")

/** The reference's end-to-end runner loop (src/runners/run_alerts.py:
  * alert queries → merge → suppressions → correlation → handler
  * dispatch, each stage recording run metadata) composed as ONE
  * declarative pipeline over DataFrames. Everything except the final
  * dispatch stays inside Catalyst; per-stage counts are the only
  * driver-side values.
  */
object Runner {

  final case class AlertRunResult(
      alerts: DataFrame,
      store: DataFrame,
      handlerResults: Dataset[HandlerResult])

  /** Run the full alert pipeline. Returned `alerts` are the live
    * (non-suppressed) alerts with correlation ids and the per-handler
    * `handled` results joined on; `store` is the full merged alert set
    * with suppression flags — the reference's results.alerts table. */
  def runAlerts(
      events: DataFrame,
      rules: Seq[AlertRule],
      idCol: Column,
      suppressions: Seq[SuppressionRule],
      sinks: Seq[AlertSink],
      cfg: RunConfig,
      log: RunLog): AlertRunResult = {

    // 1. each alert rule over the shared time window (ref:
    //    alert_queries_runner.main loops rule views). Stage counts ride
    //    the plan via observe() — the ONE terminal action below (step 5)
    //    executes every rule's event scan exactly once; the eager
    //    count-per-stage alternative would scan each rule's events twice
    //    (once for metadata, once in the composed pipeline) — a real
    //    cost at 100 TB.
    val perRule = rules.map { r =>
      log.observedInsert(r.name) {
        RuleEngine.runAlertRule(
          events, r, idCol, cfg.fromTs, cfg.toTsExclusive, cfg.alertTimeS)
      }
    }
    val alerts = perRule.reduce(_.unionByName(_))

    // 2. merge/dedup (ref: MERGE_ALERTS)
    val merged = log.observedInsert("alert_merge") {
      RuleEngine.mergeAlerts(alerts)
    }

    // 3. suppression rules, first matching rule wins (ref:
    //    alert_suppressions_runner runs each rule's UPDATE in turn)
    val suppressed = suppressions.foldLeft(
      merged.withColumn("suppressed", lit(false))
        .withColumn("suppression_rule", lit(null).cast("string"))) {
      case (acc, rule) =>
        log.observedSuppress(rule.name) {
          val ids = broadcast(rule.selectIds(acc)
            .select(col("alert_id").as("__sup_id")).distinct())
          acc.join(ids, acc("alert_id") === ids("__sup_id"), "left")
            .withColumn("suppression_rule",
              when(!col("suppressed") && col("__sup_id").isNotNull,
                lit(rule.name)).otherwise(col("suppression_rule")))
            .withColumn("suppressed",
              col("suppressed") || col("__sup_id").isNotNull)
            .drop("__sup_id")
        }
    }.persist() // the run's results table: read by correlate + returned

    // 4. correlation over the live (non-suppressed) alerts (ref:
    //    alert_processor processes unsuppressed alerts)
    val live = RuleEngine.correlate(
      suppressed.filter(!col("suppressed")), cfg.correlationGapMinutes)

    // 5. handler fan-out on live alerts + per-handler results joined
    //    back (ref: alert_dispatcher.main + record_status). Dispatch is
    //    side-effecting and AT-LEAST-ONCE, like the reference's poll
    //    loop: the eager persist+count makes the common path single-send,
    //    but cache eviction, task retry, or speculation can re-run a
    //    partition and re-invoke send — external handlers must dedupe on
    //    (alert_id, handler), which every HandlerResult carries.
    val results = Dispatcher.dispatch(live, sinks, cfg.defaultHandler)
      .persist()
    // THE terminal action: executes rules → merge → suppress →
    // correlate → dispatch once, delivering every observed stage metric
    // as a side channel. suppressed is persisted above so the later
    // recordStatus/store consumers re-read the cache, not the scans.
    results.count()
    log.flush()
    val handled = log.timedInsert("alert_dispatch") {
      Dispatcher.recordStatus(live, results)
    }

    AlertRunResult(handled, suppressed, results)
  }

  /** The violation runner loop (ref: violation_queries_runner.py +
    * violation_suppressions_runner.py): each rule's grouped input →
    * identity-hashed violations → suppression flags. Like runAlerts,
    * stage counts ride the plan via observe(); the returned results
    * table is materialized ONCE (that materialization is the terminal
    * action resolving every stage metric), so no rule input is scanned
    * twice for metadata. */
  def runViolations(
      ruleInputs: Seq[(ViolationRule, DataFrame)],
      suppressions: Seq[SuppressionRule],
      log: RunLog): DataFrame = {
    val violations = ruleInputs.map { case (rule, grouped) =>
      log.observedInsert(rule.name) {
        RuleEngine.runViolationRule(grouped, rule)
      }
    }.reduce(_.unionByName(_))
    val flagged = suppressions.foldLeft(
      violations.withColumn("suppressed", lit(false))
        .withColumn("suppression_rule", lit(null).cast("string"))) {
      case (acc, rule) =>
        log.observedSuppress(rule.name) {
          val ids = broadcast(rule.selectIds(acc)
            .select(col("id").as("__sup_id")).distinct())
          acc.join(ids, acc("id") === ids("__sup_id"), "left")
            .withColumn("suppression_rule",
              when(!col("suppressed") && col("__sup_id").isNotNull,
                lit(rule.name)).otherwise(col("suppression_rule")))
            .withColumn("suppressed",
              col("suppressed") || col("__sup_id").isNotNull)
            .drop("__sup_id")
        }
    }.transform(graft.Materialize.frame)
    log.flush()
    flagged
  }
}
