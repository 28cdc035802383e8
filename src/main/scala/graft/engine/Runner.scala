package graft.engine

import scala.util.control.NonFatal

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
  *
  * Failure isolation mirrors the reference's error contract
  * (alert_queries_runner.py create_alerts wraps EACH rule in its own
  * try/except — a broken rule records a metadata ERROR row and the run
  * CONTINUES; the reference's own regression run_violations.py:28-46
  * plants a `1/0` rule and asserts the healthy rule's rows still land
  * with the broken rule's run record carrying the error). Here the
  * fast path still fuses every rule into one scan-shared plan; rules
  * whose frames fail to CONSTRUCT (analysis errors: missing column,
  * bad type) are dropped per-rule with an ERROR row. If the fused
  * terminal action fails at RUNTIME (a rule's projection throws
  * mid-task: bad regex, malformed cast, divide-by-zero), the run
  * degrades to per-rule isolation — each surviving rule is probed with
  * its own action (failing rules record ERROR rows), and the pipeline
  * re-runs on the healthy set with eager per-stage metadata. The
  * degraded path scans each rule's events individually — the
  * correctness-over-scan-sharing trade the reference's per-rule loop
  * makes on EVERY run, paid here only when a rule is actually broken.
  */
object Runner {

  /** Marker for a failure of the fused TERMINAL action only. The
    * degraded per-rule path must fire for exactly this case: a rule's
    * projection throwing mid-task inside the shared plan. Failures in
    * later stages (log flush, dispatch recordStatus) happen AFTER the
    * observed metadata rows were flushed and the side-effecting
    * dispatch already ran — degrading there would duplicate every
    * rule's metadata row and re-send every alert, so those propagate
    * unwrapped. */
  private final class FusedPlanFailure(cause: Throwable)
    extends Exception(cause)

  final case class AlertRunResult(
      alerts: DataFrame,
      store: DataFrame,
      handlerResults: Dataset[HandlerResult])

  /** Literal-only rule: analysis-safe on any event frame; yields the
    * alert schema with zero rows (the all-rules-broken fallback). */
  private def emptyAlerts(
      events: DataFrame, idCol: Column, cfg: RunConfig): DataFrame =
    RuleEngine.runAlertRule(
      events.limit(0),
      AlertRule(name = "__no_live_rules", queryId = "", title = "",
        predicate = lit(false), actor = lit(""), target = lit(""),
        action = lit(""), description = lit(""), severity = lit(""),
        eventTime = lit("1970-01-01 00:00:00").cast("timestamp"),
        eventData = lit("{}")),
      idCol, cfg.fromTs, cfg.toTsExclusive, cfg.alertTimeS)

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

    def ruleFrame(r: AlertRule): DataFrame =
      RuleEngine.runAlertRule(
        events, r, idCol, cfg.fromTs, cfg.toTsExclusive, cfg.alertTimeS)

    // 1. each alert rule over the shared time window (ref:
    //    alert_queries_runner.main loops rule views), ISOLATED
    //    per-rule: an analysis-broken rule throws inside
    //    observedInsert (Datasets analyze eagerly), which records its
    //    ERROR metadata row; the rule drops out and the run continues.
    //    Stage counts for healthy rules ride the plan via observe() —
    //    the ONE terminal action below executes every rule's event
    //    scan exactly once; the eager count-per-stage alternative
    //    would scan each rule's events twice — a real cost at 100 TB.
    val constructed: Seq[(AlertRule, DataFrame)] = rules.flatMap { r =>
      try Some(r -> log.observedInsert(r.name)(ruleFrame(r)))
      catch { case NonFatal(_) => None } // ERROR row already recorded
    }
    val alerts =
      if (constructed.isEmpty) emptyAlerts(events, idCol, cfg)
      else constructed.map(_._2).reduce(_.unionByName(_))

    try pipeline(alerts, suppressions, sinks, cfg, log, observed = true)
    catch {
      case _: FusedPlanFailure =>
        // a rule's projection threw at RUNTIME inside the fused plan.
        // The pending observations can never resolve — discard them —
        // then probe each constructed rule with its own action: the
        // broken rule records its ERROR row (ref: per-rule try/except),
        // everyone else records real counts, and the pipeline re-runs
        // on the survivors with eager per-stage metadata. Rules that
        // already failed construction keep their pass-1 ERROR row (one
        // metadata row per rule per run, like the reference).
        log.discardPending()
        // the probe must evaluate EVERY column, not just count rows —
        // a bare count() lets column pruning skip the very projection
        // that threw (the bomb would re-enter the pipeline and fail it
        // again downstream). Materialize.frame stores full rows, so a
        // broken projection throws here, inside this rule's own probe;
        // healthy rules re-enter the pipeline pre-materialized.
        val survivors = constructed.flatMap { case (r, _) =>
          try Some(log.timedInsert(r.name)(
            graft.Materialize.frame(ruleFrame(r))))
          catch { case NonFatal(_) => None }
        }
        val healthy =
          if (survivors.isEmpty) emptyAlerts(events, idCol, cfg)
          else survivors.reduce(_.unionByName(_))
        try pipeline(healthy, suppressions, sinks, cfg, log,
          observed = false)
        catch { // a second terminal failure (e.g. a broken sink set)
          // is final — surface the real cause, not the marker
          case f: FusedPlanFailure => throw f.getCause
        }
    }
  }

  /** merge → suppress → correlate → dispatch over an assembled alert
    * set, with per-stage metadata either observed (fast path: metrics
    * ride the plan, one terminal action) or eager (degraded path: one
    * action per stage, each stage individually isolable). */
  private def pipeline(
      alerts: DataFrame,
      suppressions: Seq[SuppressionRule],
      sinks: Seq[AlertSink],
      cfg: RunConfig,
      log: RunLog,
      observed: Boolean): AlertRunResult = {

    def insertStage(name: String)(stage: => DataFrame): DataFrame =
      if (observed) log.observedInsert(name)(stage)
      else log.timedInsert(name)(stage)
    def suppressStage(name: String)(stage: => DataFrame): DataFrame =
      if (observed) log.observedSuppress(name)(stage)
      else log.timedSuppress(name)(stage)

    // 2. merge/dedup (ref: MERGE_ALERTS)
    val merged = insertStage("alert_merge")(RuleEngine.mergeAlerts(alerts))

    // 3. suppression rules, first matching rule wins (ref:
    //    alert_suppressions_runner runs each rule's UPDATE in its own
    //    try/except — a broken suppression records an ERROR row and is
    //    skipped, the alert set passes through unflagged by it)
    val suppressed = suppressions.foldLeft(
      merged.withColumn("suppressed", lit(false))
        .withColumn("suppression_rule", lit(null).cast("string"))) {
      case (acc, rule) =>
        try {
          suppressStage(rule.name) {
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
        } catch { case NonFatal(_) => acc } // ERROR row recorded; skip
    } // the run's results table: read by correlate + returned

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
    // THE fused-plan materialization: persist() eagerly optimizes the
    // cached plan (a bomb projection over a folded-local input can
    // throw right there, at plan time) and count() executes rules →
    // merge → suppress → correlate → dispatch once, delivering every
    // observed stage metric as a side channel. ANY failure in this
    // region is the fused-plan failure the caller degrades on; the
    // caches are released first. suppressed is persisted so the later
    // recordStatus/store consumers re-read the cache, not the scans.
    try {
      suppressed.persist()
      results.persist()
      results.count()
    } catch {
      case NonFatal(e) =>
        results.unpersist(blocking = false)
        suppressed.unpersist(blocking = false)
        throw new FusedPlanFailure(e)
    }
    // post-terminal failures (flush, recordStatus) propagate WITHOUT
    // degradation — but must not strand the pass-1 caches, which on
    // success stay persisted for the returned frames' consumers
    try {
      log.flush()
      val handled = log.timedInsert("alert_dispatch") {
        Dispatcher.recordStatus(live, results)
      }
      AlertRunResult(handled, suppressed, results)
    } catch {
      case NonFatal(e) =>
        results.unpersist(blocking = false)
        suppressed.unpersist(blocking = false)
        throw e
    }
  }

  /** Literal-only violation rule over an empty input: the violation
    * schema with zero rows (the all-rules-broken fallback). */
  private def emptyViolations(anyInput: DataFrame): DataFrame =
    RuleEngine.runViolationRule(
      anyInput.limit(0),
      ViolationRule(name = "__no_live_rules", queryId = "", title = "",
        predicate = lit(false), target = lit(""), owner = lit(""),
        severity = lit(""), day = lit("1970-01-01").cast("date")))

  /** The violation runner loop (ref: violation_queries_runner.py +
    * violation_suppressions_runner.py): each rule's grouped input →
    * identity-hashed violations → suppression flags. Like runAlerts,
    * stage counts ride the plan via observe(); the returned results
    * table is materialized ONCE (that materialization is the terminal
    * action resolving every stage metric), so no rule input is scanned
    * twice for metadata. Failure isolation mirrors run_violations.py's
    * invalid-rule regression: a rule broken at analysis OR runtime
    * yields an ERROR metadata row while every other rule's violations
    * land. */
  def runViolations(
      ruleInputs: Seq[(ViolationRule, DataFrame)],
      suppressions: Seq[SuppressionRule],
      log: RunLog): DataFrame = {
    require(ruleInputs.nonEmpty, "runViolations needs at least one rule")

    val constructed = ruleInputs.flatMap { case (rule, grouped) =>
      try Some((rule, grouped,
        log.observedInsert(rule.name)(
          RuleEngine.runViolationRule(grouped, rule))))
      catch { case NonFatal(_) => None } // ERROR row already recorded
    }

    def downstream(violations: DataFrame, observed: Boolean): DataFrame = {
      def suppressStage(name: String)(stage: => DataFrame): DataFrame =
        if (observed) log.observedSuppress(name)(stage)
        else log.timedSuppress(name)(stage)
      val flagged = suppressions.foldLeft(
        violations.withColumn("suppressed", lit(false))
          .withColumn("suppression_rule", lit(null).cast("string"))) {
        case (acc, rule) =>
          try {
            suppressStage(rule.name) {
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
          } catch { case NonFatal(_) => acc }
      }
      // the terminal action resolving every observed stage metric; on
      // the fused path its failure is marked so ONLY it (a rule's
      // projection throwing mid-task) can trigger degradation
      if (observed)
        try flagged.transform(graft.Materialize.frame)
        catch { case NonFatal(e) => throw new FusedPlanFailure(e) }
      else flagged.transform(graft.Materialize.frame)
    }

    val union =
      if (constructed.isEmpty) emptyViolations(ruleInputs.head._2)
      else constructed.map(_._3).reduce(_.unionByName(_))
    val out = try downstream(union, observed = true) catch {
      case _: FusedPlanFailure =>
        // runtime failure inside the fused plan: degrade to per-rule
        // isolation (ref: violation_queries_runner per-rule try/except)
        log.discardPending()
        // full-row probe, not count(): see runAlerts — pruning would
        // skip the broken projection and re-admit the bomb
        val survivors = constructed.flatMap { case (rule, grouped, _) =>
          try Some(log.timedInsert(rule.name)(graft.Materialize.frame(
            RuleEngine.runViolationRule(grouped, rule))))
          catch { case NonFatal(_) => None }
        }
        val healthy =
          if (survivors.isEmpty) emptyViolations(ruleInputs.head._2)
          else survivors.reduce(_.unionByName(_))
        downstream(healthy, observed = false)
    }
    // flush OUTSIDE the degradation scope (a flush-time failure after a
    // successful terminal action must propagate, not duplicate every
    // rule's metadata via a re-run); no-op on the degraded path, whose
    // pending observations were discarded and rows recorded eagerly
    log.flush()
    out
  }
}
