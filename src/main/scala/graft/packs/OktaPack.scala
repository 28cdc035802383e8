package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{AlertRule, RuleEngine}

/** Okta rules on the AlertRule API over an okta-system-log-shaped view
  * (packs/okta.sql data.okta_system_logs projection; the failed-login
  * alert is the canonical rule written over that view). Derived
  * deterministically from `events` so it has a full DuckDB oracle.
  */
object OktaPack {
  import Tables.t

  private val From = "2024-01-01 00:00:00"
  private val To = "2024-02-01 00:00:00"
  private val AlertTimeS = 1706745600L // 2024-02-01T00:00:00Z

  /** okta_system_logs-shaped view: view events as session starts;
    * outcome fails when the event value is in the low band. */
  def systemLogFromEvents(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events
      .filter(col("event_type") === "view")
      .select(
        col("event_id").cast("string").as("uuid"),
        col("ts").as("published"),
        lit("user.session.start").as("okta_event_type"),
        concat_ws("", lit("u"), col("user_id"), lit("@example.com"))
          .as("actor_email"),
        k.as("k"),
        col("value"),
        col("props").as("raw"))
      .withColumn("client_ip",
        concat_ws(".", lit("10"), lit("2"), col("k") % 256, lit("1")))
      .withColumn("outcome_result",
        when(col("value") < 15.0, "FAILURE").otherwise("SUCCESS"))
      .withColumn("outcome_reason",
        when(col("outcome_result") === "FAILURE",
          lit("INVALID_CREDENTIALS")))
  }

  /** Failed Okta session start → alert (the okta.sql views' intended
    * consumer; semantics mirror the snowflake auth-failure rule shape). */
  val failedLogin: AlertRule = AlertRule(
    name = "okta_failed_login",
    queryId = "okta001",
    title = "Okta Failed Login",
    predicate = col("outcome_result") === "FAILURE",
    actor = col("actor_email"),
    target = col("actor_email"),
    action = col("okta_event_type"),
    description = concat_ws("", lit("Failed Okta login for "),
      col("actor_email"), lit(" from "), col("client_ip"),
      lit(": "), col("outcome_reason")),
    severity = lit("medium"),
    eventTime = col("published"),
    eventData = col("raw"),
    environment = "okta",
    sources = "okta_system_log",
    detector = "SnowAlert")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_okta_failed_login" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runAlertRule(
        systemLogFromEvents(t(s, dir, "events")),
        failedLogin, col("uuid"),
        From, To, AlertTimeS).orderBy(col("alert_id")))
  )

  def oracle: Map[String, String] = Map(
    "q_pack_okta_failed_login" ->
      s"""WITH ol0 AS (
         |  SELECT CAST(event_id AS VARCHAR) AS uuid,
         |    ts AS published,
         |    'user.session.start' AS okta_event_type,
         |    'u' || user_id || '@example.com' AS actor_email,
         |    CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
         |    value, props AS raw
         |  FROM events WHERE event_type = 'view'
         |), ol AS (
         |  SELECT ol0.*,
         |    '10.2.' || (k % 256) || '.1' AS client_ip,
         |    CASE WHEN value < 15.0 THEN 'FAILURE' ELSE 'SUCCESS' END
         |      AS outcome_result,
         |    CASE WHEN value < 15.0 THEN 'INVALID_CREDENTIALS' END
         |      AS outcome_reason
         |  FROM ol0
         |)
         |SELECT md5('okta_failed_login:' || uuid) AS alert_id,
         |  'okta_failed_login' AS query_name, 'okta001' AS query_id,
         |  'okta' AS environment, 'okta_system_log' AS sources,
         |  actor_email AS actor, actor_email AS object,
         |  okta_event_type AS action,
         |  'Okta Failed Login' AS title,
         |  epoch_ns(published) // 1000000000 AS event_time_s,
         |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
         |  'Failed Okta login for ' || actor_email || ' from ' ||
         |    client_ip || ': ' || outcome_reason AS description,
         |  'SnowAlert' AS detector, raw AS event_data,
         |  'medium' AS severity, CAST(1 AS BIGINT) AS counter
         |FROM ol
         |WHERE outcome_result = 'FAILURE'
         |  AND published >= TIMESTAMP '2024-01-01'
         |  AND published < TIMESTAMP '2024-02-01'
         |ORDER BY alert_id""".stripMargin
  )
}
