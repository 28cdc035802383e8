package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{AlertRule, RuleEngine}

/** packs/snowflake_query_pack.sql rules ported onto the AlertRule API,
  * over a login-history-shaped view derived deterministically from
  * `events` (so the rule has a full DuckDB oracle). */
object SnowflakePack {
  import Tables.t

  private val From = "2024-01-01 00:00:00"
  private val To = "2024-02-01 00:00:00"
  private val AlertTimeS = 1706745600L // 2024-02-01T00:00:00Z

  /** login_history-shaped view (ref account_usage.login_history): every
    * event is an authentication attempt; low-value events fail. Client
    * type, auth factors, and error codes are derived deterministically
    * so the whole snowflake_security_monitoring pack (ip/user login-fail
    * profiling, no-MFA logins) runs over this one view. Mirrored exactly
    * by LoginCte. */
  def loginHistoryFromEvents(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events
      .select(
        col("event_id").cast("string").as("event_id"),
        col("ts").as("event_timestamp"),
        concat_ws("", lit("u"), col("user_id")).as("user_name"),
        col("user_id"),
        k.as("k"),
        col("value"),
        col("props").as("raw"))
      .withColumn("client_ip",
        concat_ws(".", lit("10"), lit("1"), col("k") % 4,
          col("user_id") % 4))
      .withColumn("reported_client_type",
        when(col("k") % 3 === 0, "SNOWFLAKE_UI")
          .when(col("k") % 3 === 1, "JDBC_DRIVER")
          .otherwise("OTHER"))
      .withColumn("first_authentication_factor", lit("PASSWORD"))
      .withColumn("second_authentication_factor",
        when(col("user_id") % 3 =!= 0, "DUO_PUSH"))
      .withColumn("is_success",
        when(col("value") < 25.0, "NO").otherwise("YES"))
      .withColumn("error_code",
        when(col("is_success") === "NO",
          lit(390100) + (col("k") % 5) * 2))
      .withColumn("error_message",
        when(col("is_success") === "NO",
          when(col("k") % 5 < 3, "INCORRECT_USERNAME_PASSWORD")
            .otherwise("JWT_TOKEN_INVALID")))
  }

  /** DuckDB mirror of loginHistoryFromEvents (shared by the monitoring
    * pack oracles). */
  val LoginCte: String =
    """WITH lh0 AS (
      |  SELECT CAST(event_id AS VARCHAR) AS event_id,
      |    ts AS event_timestamp,
      |    'u' || user_id AS user_name,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |    value, props AS raw, user_id
      |  FROM events
      |), lh AS (
      |  SELECT lh0.*,
      |    '10.1.' || (k % 4) || '.' || (user_id % 4) AS client_ip,
      |    CASE k % 3 WHEN 0 THEN 'SNOWFLAKE_UI' WHEN 1 THEN 'JDBC_DRIVER'
      |         ELSE 'OTHER' END AS reported_client_type,
      |    'PASSWORD' AS first_authentication_factor,
      |    CASE WHEN user_id % 3 <> 0 THEN 'DUO_PUSH' END
      |      AS second_authentication_factor,
      |    CASE WHEN value < 25.0 THEN 'NO' ELSE 'YES' END AS is_success,
      |    CASE WHEN value < 25.0 THEN 390100 + (k % 5) * 2 END
      |      AS error_code,
      |    CASE WHEN value < 25.0 THEN
      |      (CASE WHEN k % 5 < 3 THEN 'INCORRECT_USERNAME_PASSWORD'
      |            ELSE 'JWT_TOKEN_INVALID' END) END AS error_message
      |  FROM lh0
      |)""".stripMargin

  /** Per-(session, sf-dir) shared login_history frame (the reference's
    * `snowflake.login_history_v` view layer): the 4 login-profiling
    * rules across this pack + the monitoring pack read this one
    * persisted frame instead of re-deriving it from `events` per rule. */
  def sharedLoginHistory(spark: SparkSession, dir: String): DataFrame =
    graft.sources.SharedFrames.get(spark, dir, "login_history_v") {
      loginHistoryFromEvents(t(spark, dir, "events"))
    }

  /** packs/snowflake_query_pack.sql:50-71
    * snowflake_authentication_failure: every failed login is an alert. */
  val authenticationFailure: AlertRule = AlertRule(
    name = "snowflake_authentication_failure",
    queryId = "c24675c89deb4e5ba6ecc57104447f90",
    title = "Snowflake Authentication Failure",
    predicate = col("is_success") === "NO",
    actor = col("user_name"),
    target = lit("Snowflake"),
    action = lit("failed to authenticate to Snowflake"),
    description = concat_ws("", lit("User "), col("user_name"),
      lit(" failed to authentication to Snowflake, from IP: "),
      col("client_ip")),
    severity = lit("Low"),
    eventTime = col("event_timestamp"),
    eventData = col("error_message"),
    environment = "snowflake",
    sources = "snowflake",
    detector = "SnowAlert")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sf_auth_failure" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runAlertRule(
        sharedLoginHistory(s, dir),
        authenticationFailure, col("event_id"),
        From, To, AlertTimeS).orderBy(col("alert_id")))
  )

  def oracle: Map[String, String] = Map(
    "q_pack_sf_auth_failure" ->
      s"""$LoginCte
         |SELECT md5('snowflake_authentication_failure:' || event_id)
         |    AS alert_id,
         |  'snowflake_authentication_failure' AS query_name,
         |  'c24675c89deb4e5ba6ecc57104447f90' AS query_id,
         |  'snowflake' AS environment, 'snowflake' AS sources,
         |  user_name AS actor, 'Snowflake' AS object,
         |  'failed to authenticate to Snowflake' AS action,
         |  'Snowflake Authentication Failure' AS title,
         |  epoch_ns(event_timestamp) // 1000000000 AS event_time_s,
         |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
         |  'User ' || user_name ||
         |    ' failed to authentication to Snowflake, from IP: ' ||
         |    client_ip AS description,
         |  'SnowAlert' AS detector, error_message AS event_data,
         |  'Low' AS severity, CAST(1 AS BIGINT) AS counter
         |FROM lh
         |WHERE is_success = 'NO'
         |  AND event_timestamp >= TIMESTAMP '2024-01-01'
         |  AND event_timestamp < TIMESTAMP '2024-02-01'
         |ORDER BY alert_id""".stripMargin
  )
}
