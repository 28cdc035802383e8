package graft

import org.apache.spark.sql.functions._

import graft.engine.{AlertRule, MemorySink, RuleEngine, RunConfig, RunLog,
  Runner, SuppressionRule}

/** End-to-end runner pipeline: rules → merge → suppress → correlate →
  * dispatch with metadata (the reference's run_alerts.py loop). */
class RunnerSpec extends SparkSuite {
  import spark.implicits._

  private def mkEvents = Seq(
    (1L, "2024-01-01 10:00:00", 1L, "error", 120.0),
    (2L, "2024-01-01 10:30:00", 1L, "error", 130.0),
    (3L, "2024-01-01 11:00:00", 2L, "login", 5.0),
    (4L, "2024-01-01 12:00:00", 3L, "error", 250.0),
    (5L, "2024-01-01 12:05:00", 3L, "error", 260.0)
  ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
    .withColumn("ts", col("ts_s").cast("timestamp"))
    .withColumn("props", lit("{}"))

  private def rule(n: String, pred: org.apache.spark.sql.Column) =
    AlertRule(
      name = n, queryId = n, title = n,
      predicate = pred,
      actor = concat_ws("", lit("u"), col("user_id")),
      target = concat_ws("", lit("u"), col("user_id")),
      action = col("event_type"),
      description = concat_ws("", lit(n), lit(":u"), col("user_id")),
      severity = lit("medium"),
      eventTime = col("ts"),
      eventData = col("props"))

  test("full alert run: rules, merge, suppress, correlate, dispatch, metadata") {
    val buf = s"runner-${System.nanoTime()}"
    val log = RunLog.newRun()
    val result = Runner.runAlerts(
      events = mkEvents,
      rules = Seq(
        rule("errors", col("event_type") === "error"),
        rule("logins", col("event_type") === "login")),
      idCol = col("event_id"),
      suppressions = Seq(SuppressionRule("squelch_u1",
        alerts => alerts.filter(col("actor") === "u1").select("alert_id"))),
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = log)

    // the store holds all merged alerts with suppression flags:
    // 5 raw alerts merge to 3 (u1 errors merge, u3 errors merge, login)
    val store = result.store.collect()
    assert(store.length == 3)
    assert(store.count(_.getAs[Boolean]("suppressed")) == 1)
    assert(store.find(_.getAs[Boolean]("suppressed")).get
      .getAs[String]("suppression_rule") == "squelch_u1")
    // live alerts exclude suppressed u1 and are correlated + dispatched
    val alerts = result.alerts.collect()
    assert(alerts.length == 2)
    assert(alerts.forall(a => a.getAs[String]("actor") != "u1"))
    assert(alerts.forall(_.getAs[String]("correlation_id") != null))
    // every live alert was dispatched to the memory sink exactly once
    val delivered = MemorySink.drain(buf)
    assert(delivered.length == 2)
    val handlerRows = result.handlerResults.collect()
    assert(handlerRows.length == 2 && handlerRows.forall(_.success))
    // handled column carries the per-handler result struct
    assert(alerts.forall(
      _.getAs[scala.collection.Seq[Any]]("handled").length == 1))
    // metadata: one row per rule + merge + suppression + dispatch
    val meta = log.entries
    assert(meta.map(_.query_name) ==
      Seq("errors", "logins", "alert_merge", "squelch_u1", "alert_dispatch"))
    assert(meta.head.inserted == 4) // errors rule: 4 matching events
    assert(meta(1).inserted == 1)
    assert(meta(2).inserted == 3) // 5 raw alerts merged to 3
    assert(meta(3).suppressed == 1 && meta(3).passed == 2)
    assert(meta(4).inserted == 2) // live handled alerts
  }

  test("alerts from DIFFERENT rules sharing (object, description) merge " +
      "into one (reference tests/run_alerts.py: Test 1 groups with Test 3)") {
    // the reference's own end-to-end test plants two rules whose
    // alerts share OBJECT + DESCRIPTION and asserts they land as ONE
    // merged alert; graft merges over the UNION of all rules' output,
    // so the cross-rule group must collapse with counter 2
    val buf = s"runner-x-${System.nanoTime()}"
    def sharedRule(n: String) = AlertRule(
      name = n, queryId = n, title = n,
      predicate = col("event_type") === "login",
      actor = lit("Common Test Actor"),
      target = lit("""["obj1","obj2"]"""),
      action = lit("test action"),
      description = lit("shared description"),
      severity = lit("low"),
      eventTime = col("ts"), eventData = col("props"))
    val result = Runner.runAlerts(
      events = mkEvents,
      rules = Seq(sharedRule("test1"), sharedRule("test3")),
      idCol = col("event_id"),
      suppressions = Nil,
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = RunLog.newRun())
    MemorySink.drain(buf)
    val store = result.store.collect()
    assert(store.length == 1, "cross-rule same-(object,description) " +
      "alerts must merge to one row")
    assert(store.head.getAs[Long]("counter") == 2L)
  }

  test("each rule's event scan executes once per run (observed metrics)") {
    // metadata counts ride the plan via observe(); an eager count-per-
    // stage runner would read every event row at least twice. The
    // accumulator counts actual row reads of the event source.
    val acc = spark.sparkContext.longAccumulator("event-row-reads")
    val tick = udf { () => acc.add(1); true }.asNondeterministic()
    val counted = mkEvents.filter(tick())
    val buf = s"runner-scan-${System.nanoTime()}"
    val log = RunLog.newRun()
    Runner.runAlerts(
      events = counted,
      rules = Seq(
        rule("errors", col("event_type") === "error"),
        rule("logins", col("event_type") === "login")),
      idCol = col("event_id"),
      suppressions = Nil,
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = log)
    // 2 rule branches × 5 events: each branch reads the source once
    assert(acc.value == 10,
      s"expected 10 event-row reads (one scan per rule), got ${acc.value}")
    // the observed metadata rows still populate with exact counts
    assert(log.entries.map(_.query_name) ==
      Seq("errors", "logins", "alert_merge", "alert_dispatch"))
    assert(log.entries.head.inserted == 4)
    assert(log.entries(1).inserted == 1)
    assert(log.entries(2).inserted == 3)
  }

  test("monitoring rule over run metadata flags failed rule runs") {
    // the reference's snowalert_query_rule_run_errors pattern: the
    // metadata table is itself a rule source (ref: db.record_metadata +
    // packs/snowflake_security_monitoring.sql error rules)
    val log = RunLog.newRun()
    log.timedInsert("good_rule") {
      RuleEngine.runAlertRule(mkEvents,
        rule("good_rule", col("event_type") === "error"), col("event_id"),
        "2024-01-01 00:00:00", "2024-01-02 00:00:00", 0L)
    }
    intercept[Exception] {
      log.timedInsert("broken_rule") { mkEvents.select(col("missing")) }
    }

    val meta = log.toDF(spark)
      .withColumn("ts", to_timestamp(col("start_time_ms") / 1000.0))
    val monitor = graft.engine.AlertRule(
      name = "rule_run_errors", queryId = "mon1",
      title = "Rule run error",
      predicate = col("error").isNotNull,
      actor = lit("graft"),
      target = col("query_name"),
      action = lit("rule_run_failed"),
      description = col("error"),
      severity = lit("high"),
      eventTime = col("ts"),
      eventData = col("error"))
    val alerts = RuleEngine.runAlertRule(meta, monitor, col("query_name"),
      "2000-01-01 00:00:00", "2100-01-01 00:00:00", 0L).collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("object") == "broken_rule")
  }

  test("violation run: rules + suppression with identity-hash ids") {
    import graft.engine.{Runner, ViolationRule}
    val daily = mkEvents
      .filter(col("event_type") === "error")
      .groupBy(concat_ws("", lit("u"), col("user_id")).as("target_user"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val rule = ViolationRule(
      name = "err_burst", queryId = "v1", title = "Burst",
      predicate = col("n") >= 1,
      target = col("target_user"),
      owner = lit("secops"),
      severity = lit("medium"),
      day = col("day"))
    val log = RunLog.newRun()
    val out = Runner.runViolations(
      Seq(rule -> daily),
      Seq(SuppressionRule("allow_u1",
        v => v.filter(col("object") === "u1").select("id"))),
      log)
    val rows = out.collect()
    assert(rows.length == 2) // u1 and u3 have error days
    assert(rows.count(_.getAs[Boolean]("suppressed")) == 1)
    assert(log.entries.map(_.query_name) == Seq("err_burst", "allow_u1"))
    assert(log.entries.head.inserted == 2)
  }
}
