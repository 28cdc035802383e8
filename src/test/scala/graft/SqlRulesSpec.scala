package graft

import org.apache.spark.sql.functions._

import graft.engine.{AlertRule, RuleEngine, SqlRules}

/** SQL-authored rule surface: a pack-style SQL rule produces exactly
  * what the equivalent Column-API AlertRule produces. */
class SqlRulesSpec extends SparkSuite {
  import spark.implicits._

  test("pack-style SQL rule matches the Column-API rule row-for-row") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "error", 120.0),
      (2L, "2024-01-01 10:30:00", 2L, "error", 30.0),
      (3L, "2024-01-01 11:00:00", 3L, "error", 250.0),
      (4L, "2024-01-01 11:30:00", 4L, "login", 999.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("props", lit("{}"))
    events.createOrReplaceTempView("events_v")

    // the analyst-authored view body (packs/*.sql shape: project the
    // alert fields, filter the interesting events)
    val sql =
      """SELECT event_id AS id,
        |  'u' || user_id AS actor,
        |  'u' || user_id AS object,
        |  event_type AS action,
        |  'High value error' AS title,
        |  'u' || user_id || ' errored' AS description,
        |  CASE WHEN value > 200 THEN 'high' ELSE 'medium' END AS severity,
        |  ts AS event_time,
        |  props AS event_data
        |FROM events_v
        |WHERE event_type = 'error' AND value > 100""".stripMargin

    val fromSql = SqlRules.runAlertSql(spark, sql,
      name = "sql_rule", queryId = "sq1",
      fromTs = "2024-01-01 00:00:00", toTsExclusive = "2024-01-02 00:00:00",
      alertTimeS = 7L)

    val equivalent = RuleEngine.runAlertRule(events, AlertRule(
      name = "sql_rule", queryId = "sq1", title = "High value error",
      predicate = col("event_type") === "error" && col("value") > 100,
      actor = concat_ws("", lit("u"), col("user_id")),
      target = concat_ws("", lit("u"), col("user_id")),
      action = col("event_type"),
      description = concat_ws("", lit("u"), col("user_id"), lit(" errored")),
      severity = when(col("value") > 200, "high").otherwise("medium"),
      eventTime = col("ts"),
      eventData = col("props")),
      col("event_id"), "2024-01-01 00:00:00", "2024-01-02 00:00:00", 7L)

    assert(fromSql.columns.toSeq == equivalent.columns.toSeq)
    val a = fromSql.orderBy("alert_id").collect().map(_.toSeq)
    val b = equivalent.orderBy("alert_id").collect().map(_.toSeq)
    assert(a.length == 2)
    assert(a.toSeq == b.toSeq)
    // and it composes with the rest of the pipeline
    assert(RuleEngine.mergeAlerts(fromSql).count() == 2)
  }
}
