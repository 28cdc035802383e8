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

  // --- per-rule failure isolation (ref: alert_queries_runner.py wraps
  // each rule in its own try/except; run_violations.py:28-46 plants a
  // 1/0 rule and asserts the healthy rule's rows still land while the
  // broken rule's run record carries the ERROR) ----------------------

  /** A rule whose PLAN analyzes fine but whose projection throws on
    * the first matching row at execution time — the Spark analogue of
    * the reference's `1/0 AS event_data` (non-ANSI division returns
    * null here, so the bomb is an explicit data-dependent
    * raise_error, un-foldable by the optimizer). */
  private def runtimeBombRule(n: String) =
    AlertRule(
      name = n, queryId = n, title = n,
      predicate = col("event_type") === "error",
      actor = concat_ws("", lit("u"), col("user_id")),
      target = concat_ws("", lit("u"), col("user_id")),
      action = col("event_type"),
      description = when(length(col("event_type")) >= 0,
        raise_error(concat(lit("division by zero:"), col("event_type"))))
        .otherwise(lit("unreachable")),
      severity = lit("high"),
      eventTime = col("ts"),
      eventData = col("props"))

  test("a rule that throws at RUNTIME yields an ERROR metadata row " +
      "while every other rule's alerts land (run_violations.py contract)") {
    val buf = s"runner-bomb-${System.nanoTime()}"
    val log = RunLog.newRun()
    val result = Runner.runAlerts(
      events = mkEvents,
      rules = Seq(
        rule("healthy_errors", col("event_type") === "error"),
        runtimeBombRule("invalid_rule"),
        rule("healthy_logins", col("event_type") === "login")),
      idCol = col("event_id"),
      suppressions = Seq(SuppressionRule("squelch_u1",
        alerts => alerts.filter(col("actor") === "u1").select("alert_id"))),
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = log)

    // the healthy rules' full output lands: 4 error alerts merge to 2
    // + 1 login = 3 store rows, none from the broken rule
    val store = result.store.collect()
    assert(store.length == 3)
    assert(store.forall(_.getAs[String]("query_name") != "invalid_rule"))
    // suppression still applied on the healthy set
    assert(store.count(_.getAs[Boolean]("suppressed")) == 1)
    // live alerts dispatched (u1 suppressed → u3 error + u2 login)
    val alerts = result.alerts.collect()
    assert(alerts.length == 2)
    MemorySink.drain(buf)

    // metadata: exactly one row per rule; the broken rule's row
    // carries the error with zero counts, the healthy rows real counts
    val byName = log.entries.groupBy(_.query_name)
    assert(byName("invalid_rule").size == 1)
    val bad = byName("invalid_rule").head
    assert(bad.error.exists(_.contains("division by zero")))
    assert(bad.inserted == 0)
    assert(byName("healthy_errors").size == 1)
    assert(byName("healthy_errors").head.error.isEmpty)
    assert(byName("healthy_errors").head.inserted == 4)
    assert(byName("healthy_logins").head.inserted == 1)
    // no orphaned "metrics never observed" noise from the failed
    // fused attempt
    assert(log.entries.forall(r =>
      !r.error.exists(_.contains("metrics never observed"))))
  }

  test("a rule broken at ANALYSIS (missing column) records its ERROR " +
      "row and the fused fast path continues without it") {
    val buf = s"runner-an-${System.nanoTime()}"
    val log = RunLog.newRun()
    val acc = spark.sparkContext.longAccumulator("event-reads-iso")
    val tick = udf { () => acc.add(1); true }.asNondeterministic()
    val counted = mkEvents.filter(tick())
    val result = Runner.runAlerts(
      events = counted,
      rules = Seq(
        rule("healthy_errors", col("event_type") === "error"),
        rule("no_such_col", col("nonexistent_column") === "x")),
      idCol = col("event_id"),
      suppressions = Nil,
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = log)
    MemorySink.drain(buf)
    assert(result.store.collect().length == 2) // u1 + u3 merged errors
    val bad = log.entries.filter(_.query_name == "no_such_col")
    assert(bad.size == 1 && bad.head.error.nonEmpty)
    // the healthy rule kept the scan-shared fast path: its 5-row scan
    // ran ONCE (no degraded per-rule re-probe)
    assert(acc.value == 5,
      s"analysis failure must not trigger the degraded re-run: ${acc.value}")
    assert(log.entries.filter(_.query_name == "healthy_errors")
      .head.inserted == 4)
  }

  test("violation run: an invalid rule records ERROR, the healthy " +
      "rule's violations land (mirrors reference run_violations.py)") {
    import graft.engine.{Runner, ViolationRule}
    val daily = mkEvents
      .filter(col("event_type") === "error")
      .groupBy(concat_ws("", lit("u"), col("user_id")).as("target_user"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val healthy = ViolationRule(
      name = "err_burst", queryId = "v1", title = "Burst",
      predicate = col("n") >= 1,
      target = col("target_user"),
      owner = lit("secops"), severity = lit("medium"), day = col("day"))
    val invalid = ViolationRule(
      name = "invalid_violation", queryId = "v2", title = "Invalid",
      predicate = col("n") >= 1,
      target = when(col("n") >= 0,
        raise_error(concat(lit("division by zero:"),
          col("target_user")))).otherwise(lit("unreachable")),
      owner = lit("secops"), severity = lit("low"), day = col("day"))
    val log = RunLog.newRun()
    val out = Runner.runViolations(
      Seq(healthy -> daily, invalid -> daily),
      Seq(SuppressionRule("allow_u1",
        v => v.filter(col("object") === "u1").select("id"))),
      log)
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("query_name") == "err_burst"))
    assert(rows.count(_.getAs[Boolean]("suppressed")) == 1)
    val byName = log.entries.groupBy(_.query_name)
    assert(byName("invalid_violation").size == 1)
    assert(byName("invalid_violation").head.error
      .exists(_.contains("division by zero")))
    assert(byName("err_burst").head.inserted == 2)
    assert(byName("allow_u1").head.suppressed == 1)
  }

  test("a failure AFTER the fused terminal action (metadata flush) " +
      "propagates — no degraded re-run, no duplicate dispatch") {
    // the degraded per-rule path must fire ONLY when the fused terminal
    // action itself fails. A later-stage failure (here: flush) arrives
    // after the side-effecting dispatch already ran — a re-run would
    // re-send every alert and give every rule a second metadata row.
    val buf = s"runner-flush-${System.nanoTime()}"
    val log = new RunLog("flush-bomb") {
      override def flush(timeoutMs: Long): Unit =
        throw new RuntimeException("flush exploded")
    }
    val persistedBefore =
      spark.sparkContext.getPersistentRDDs.keySet
    val ex = intercept[RuntimeException] {
      Runner.runAlerts(
        events = mkEvents,
        rules = Seq(
          rule("errors", col("event_type") === "error"),
          rule("logins", col("event_type") === "login")),
        idCol = col("event_id"),
        suppressions = Nil,
        sinks = Seq(new MemorySink(buf)),
        cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
          alertTimeS = 0L, defaultHandler = "memory"),
        log = log)
    }
    assert(ex.getMessage == "flush exploded")
    // dispatch ran exactly once: 5 raw alerts merge to 3 live sends
    assert(MemorySink.drain(buf).length == 3,
      "flush failure must not re-run the pipeline (duplicate dispatch)")
    // and no degraded per-rule timedInsert rows were recorded
    assert(log.entries.isEmpty,
      s"flush failure must not degrade to per-rule probes: ${log.entries}")
    // the pass-1 suppressed/results caches were released, not stranded
    val leaked = spark.sparkContext.getPersistentRDDs.keySet
      .diff(persistedBefore)
    assert(leaked.isEmpty,
      s"post-terminal failure stranded ${leaked.size} cached RDD(s)")
  }

  test("violations: a flush failure after a successful terminal action " +
      "propagates — no per-rule re-probe rows") {
    import graft.engine.{Runner, ViolationRule}
    val daily = mkEvents
      .filter(col("event_type") === "error")
      .groupBy(concat_ws("", lit("u"), col("user_id")).as("target_user"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val vrule = ViolationRule(
      name = "err_burst", queryId = "v1", title = "Burst",
      predicate = col("n") >= 1,
      target = col("target_user"),
      owner = lit("secops"), severity = lit("medium"), day = col("day"))
    val log = new RunLog("flush-bomb-v") {
      override def flush(timeoutMs: Long): Unit =
        throw new RuntimeException("flush exploded")
    }
    val ex = intercept[RuntimeException] {
      Runner.runViolations(Seq(vrule -> daily), Nil, log)
    }
    assert(ex.getMessage == "flush exploded")
    assert(log.entries.isEmpty,
      s"flush failure must not degrade to per-rule probes: ${log.entries}")
  }

  test("ALL rules broken still returns an empty, well-formed run") {
    val buf = s"runner-all-bad-${System.nanoTime()}"
    val log = RunLog.newRun()
    val result = Runner.runAlerts(
      events = mkEvents,
      rules = Seq(runtimeBombRule("bomb1"),
        rule("no_col", col("nope") === 1)),
      idCol = col("event_id"),
      suppressions = Nil,
      sinks = Seq(new MemorySink(buf)),
      cfg = RunConfig("2024-01-01 00:00:00", "2024-01-02 00:00:00",
        alertTimeS = 0L, defaultHandler = "memory"),
      log = log)
    assert(result.store.collect().isEmpty)
    assert(result.alerts.collect().isEmpty)
    assert(MemorySink.drain(buf).isEmpty)
    assert(log.entries.count(_.error.nonEmpty) == 2)
  }
}
