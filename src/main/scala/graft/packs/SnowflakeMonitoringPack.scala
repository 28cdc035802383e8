package graft.packs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Num, Tables}
import graft.engine.{AlertRule, RuleEngine}

/** The snowflake_security_monitoring + snowflake_query_pack +
  * snowflake_cost_management rules — the monitoring pack every reference
  * deployment runs — re-expressed on the engine API over deterministic
  * query_history / login_history views derived from `events`, so every
  * rule has a full DuckDB oracle.
  *
  * Refs: packs/snowflake_security_monitoring.sql:1-108,
  * packs/snowflake_query_pack.sql:1-46,
  * packs/snowflake_cost_management.sql:1-73 (all four spend rules).
  *
  * Threshold constants that the reference hard-codes for production
  * volumes (bad-login counts, spike multipliers) are rule parameters
  * here, instantiated so the rules exercise non-trivially on the uniform
  * synthetic data; defaults match the reference.
  *
  * Scale shape: the profiling rules are single map-side-combined
  * aggregations over a pruned time window; the spike rules join a
  * 2-day aggregate against a 28-day per-key baseline — both sides
  * aggregate BEFORE the join, so the join carries one row per key, not
  * per event.
  */
object SnowflakeMonitoringPack {
  import Tables.t

  // Fixed "now" anchoring the relative DATEDIFF windows (data spans
  // 2024-01-01 .. 2024-01-30).
  private val Now = "2024-01-30 12:00:00"
  private val H24 = "2024-01-29 12:00:00"
  private val H12 = "2024-01-30 00:00:00"
  private val H5 = "2024-01-30 07:00:00"
  private val D28 = "2024-01-02 12:00:00"
  private val D2 = "2024-01-28 12:00:00"
  private val From = "2024-01-01 00:00:00"
  private val AlertTimeS = 1706616000L // 2024-01-30T12:00:00Z

  private def lh(s: SparkSession, dir: String): DataFrame =
    SnowflakePack.sharedLoginHistory(s, dir)

  /** query_history-shaped view (ref account_usage.query_history):
    * deterministic query_type / query_text / execution_status / error
    * columns derived from `events`. Mirrored exactly by QhCte. */
  def queryHistoryFromEvents(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events
      .select(
        col("event_id").cast("string").as("query_id"),
        col("ts").as("start_time"),
        concat_ws("", lit("u"), col("user_id")).as("user_name"),
        col("user_id"),
        k.as("k"),
        col("value"),
        col("event_type"))
      .withColumn("role_name",
        when(col("user_id") % 10 === 0, "ACCOUNTADMIN")
          .when(col("user_id") % 3 === 0, "SYSADMIN")
          .otherwise("PUBLIC"))
      .withColumn("query_type",
        when(col("event_type") === "signup", "CREATE_USER")
          .when(col("event_type") === "error",
            when(col("k") % 2 === 0, "ALTER_USER").otherwise("SELECT"))
          .when(col("event_type") === "click",
            when(col("k") % 5 === 0, "GRANT").otherwise("SELECT"))
          .when(col("event_type") === "purchase", "INSERT")
          .otherwise("SELECT"))
      .withColumn("error_code",
        when(col("event_type") === "error" && col("value") > 50.0,
          element_at(
            array(lit(1063), lit(3001), lit(3003), lit(3005), lit(3007),
              lit(3011), lit(3041), lit(2003)),
            (col("k") % 8 + 1).cast("int"))))
      .withColumn("execution_status",
        when(col("error_code").isNotNull, "FAIL").otherwise("SUCCESS"))
      .withColumn("error_message",
        when(col("error_code").isNotNull,
          concat_ws("", lit("SQL access control error "), col("error_code"))))
      .withColumn("query_text",
        when(col("query_type") === "CREATE_USER",
          concat_ws("", lit("CREATE USER u"), col("user_id") % 40))
          .when(col("query_type") === "GRANT",
            concat_ws("", lit("GRANT ROLE "),
              when(col("k") % 4 === 0, "SECURITYADMIN")
                .when(col("k") % 4 === 1, "ACCOUNTADMIN")
                .otherwise(lit("ENGINEER")),
              lit(" TO USER u"), col("user_id") % 7))
          .when(col("query_type") === "ALTER_USER",
            when(col("k") % 3 === 0,
              concat_ws("", lit("ALTER USER u"), col("user_id") % 40,
                lit(" SET PASSWORD = '***'")))
              .when(col("k") % 3 === 1,
                concat_ws("", lit("ALTER USER u"), col("user_id") % 40,
                  lit(" SET DEFAULT_ROLE = ADMIN")))
              .otherwise(
                concat_ws("", lit("ALTER USER u"), col("user_id") % 40,
                  lit(" SET COMMENT = 'x'"))))
          .when(col("query_type") === "INSERT",
            concat_ws("", lit("INSERT INTO t"), col("k") % 20,
              lit(" VALUES (1)")))
          .otherwise(
            concat_ws("", lit("SELECT * FROM t"), col("k") % 20)))
  }

  /** DuckDB mirror of queryHistoryFromEvents. */
  val QhCte: String =
    """WITH qh0 AS (
      |  SELECT CAST(event_id AS VARCHAR) AS query_id,
      |    ts AS start_time,
      |    'u' || user_id AS user_name,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |    value, event_type, user_id
      |  FROM events
      |), qh1 AS (
      |  SELECT qh0.*,
      |    CASE WHEN user_id % 10 = 0 THEN 'ACCOUNTADMIN'
      |         WHEN user_id % 3 = 0 THEN 'SYSADMIN'
      |         ELSE 'PUBLIC' END AS role_name,
      |    CASE event_type
      |      WHEN 'signup' THEN 'CREATE_USER'
      |      WHEN 'error' THEN
      |        (CASE WHEN k % 2 = 0 THEN 'ALTER_USER' ELSE 'SELECT' END)
      |      WHEN 'click' THEN
      |        (CASE WHEN k % 5 = 0 THEN 'GRANT' ELSE 'SELECT' END)
      |      WHEN 'purchase' THEN 'INSERT'
      |      ELSE 'SELECT' END AS query_type,
      |    CASE WHEN event_type = 'error' AND value > 50.0 THEN
      |      ([1063, 3001, 3003, 3005, 3007, 3011, 3041, 2003])[(k % 8) + 1]
      |    END AS error_code
      |  FROM qh0
      |), qh AS (
      |  SELECT qh1.*,
      |    CASE WHEN error_code IS NOT NULL THEN 'FAIL'
      |         ELSE 'SUCCESS' END AS execution_status,
      |    CASE WHEN error_code IS NOT NULL THEN
      |      'SQL access control error ' || error_code END AS error_message,
      |    CASE query_type
      |      WHEN 'CREATE_USER' THEN 'CREATE USER u' || (user_id % 40)
      |      WHEN 'GRANT' THEN 'GRANT ROLE ' ||
      |        (CASE WHEN k % 4 = 0 THEN 'SECURITYADMIN'
      |              WHEN k % 4 = 1 THEN 'ACCOUNTADMIN'
      |              ELSE 'ENGINEER' END) || ' TO USER u' || (user_id % 7)
      |      WHEN 'ALTER_USER' THEN
      |        (CASE WHEN k % 3 = 0 THEN
      |           'ALTER USER u' || (user_id % 40) || ' SET PASSWORD = ''***'''
      |         WHEN k % 3 = 1 THEN
      |           'ALTER USER u' || (user_id % 40) || ' SET DEFAULT_ROLE = ADMIN'
      |         ELSE
      |           'ALTER USER u' || (user_id % 40) || ' SET COMMENT = ''x''' END)
      |      WHEN 'INSERT' THEN 'INSERT INTO t' || (k % 20) || ' VALUES (1)'
      |      ELSE 'SELECT * FROM t' || (k % 20) END AS query_text
      |  FROM qh1
      |)""".stripMargin

  /** Shared query_history frame (the reference's `query_history_v`):
    * 6 rules read this one persisted derivation per (session, dir). */
  private def qh(s: SparkSession, dir: String): DataFrame =
    graft.sources.SharedFrames.get(s, dir, "query_history_v") {
      queryHistoryFromEvents(t(s, dir, "events"))
    }

  private def win(c: Column, from: String, to: String): Column =
    c >= lit(from).cast("timestamp") && c < lit(to).cast("timestamp")

  /** snowflake_security_monitoring.sql:1-17 — too many bad logins from a
    * single IP in the last 24h (grouped profile alert with the distinct
    * error sets the analyst triages on). Threshold = the reference's
    * `counts > 5`. */
  def ipLoginFails(lh: DataFrame, countsOver: Long = 5): DataFrame =
    lh.filter(col("error_code").isNotNull &&
        win(col("event_timestamp"), H24, Now))
      .groupBy(col("client_ip"), col("reported_client_type"))
      .agg(
        array_join(array_sort(collect_set(col("error_code").cast("string"))), ",")
          .as("error_codes"),
        array_join(array_sort(collect_set(col("error_message"))), ",")
          .as("error_messages"),
        count(col("event_id")).as("counts"))
      .filter(col("counts") > countsOver)

  /** snowflake_security_monitoring.sql:19-35 — too many bad logins by a
    * single user in the last 12h (reference default `counts > 3`;
    * instantiated at 1 for the thinner synthetic window). */
  def userLoginFails(lh: DataFrame, countsOver: Long = 3): DataFrame =
    lh.filter(col("error_code").isNotNull &&
        win(col("event_timestamp"), H12, Now))
      .groupBy(col("user_name"), col("reported_client_type"))
      .agg(
        array_join(array_sort(collect_set(col("error_code").cast("string"))), ",")
          .as("error_codes"),
        array_join(array_sort(collect_set(col("error_message"))), ",")
          .as("error_messages"),
        count(col("event_id")).as("counts"))
      .filter(col("counts") > countsOver)

  /** snowflake_security_monitoring.sql:72-86 — UI/OTHER logins without a
    * second authentication factor (24h window). */
  def noMfaLogins(lh: DataFrame): DataFrame =
    lh.filter(col("second_authentication_factor").isNull &&
        col("reported_client_type").isin("SNOWFLAKE_UI", "OTHER") &&
        win(col("event_timestamp"), H24, Now))
      .select(col("event_id"), col("event_timestamp"), col("user_name"),
        col("client_ip"), col("reported_client_type"),
        col("first_authentication_factor"),
        col("second_authentication_factor"))

  /** snowflake_security_monitoring.sql:88-108 — suspicious increase in
    * queries by a user: last-2-day count vs 28-day daily average.
    * Reference multiplier = 10; instantiated at 2 (uniform synthetic
    * data has no organic 10x spikes). Both sides aggregate before the
    * join — the join carries one row per user. */
  def querySpike(qh: DataFrame, multiplier: Double = 10.0): DataFrame = {
    val avg28 = qh.filter(win(col("start_time"), D28, Now))
      .groupBy(col("user_name"))
      .agg((count(col("query_id")) / 28.0).as("avg_queries"))
    val last2 = qh.filter(win(col("start_time"), D2, Now))
      .groupBy(col("user_name"))
      .agg(count(col("query_id")).as("ld_queries"))
    last2.join(avg28, Seq("user_name"))
      .filter(col("ld_queries") > col("avg_queries") * multiplier)
      .select(col("user_name"), col("ld_queries"),
        Num.r4(col("avg_queries")).as("avg_queries"))
  }

  /** snowflake_cost_management.sql:50-73 — warehouse spending spike:
    * last-day credit spend vs 28-day average (reference multiplier = 2).
    * The metering view derives credits from the event value. */
  def warehouseSpike(events: DataFrame, multiplier: Double = 2.0): DataFrame = {
    val meter = events.select(
      (col("user_id") % 8).as("warehouse_id"),
      concat_ws("", lit("wh"), col("user_id") % 8).as("warehouse_name"),
      (col("value") / 100.0).as("credits_used"),
      col("ts").as("start_time"))
    val avg28 = meter.filter(win(col("start_time"), D28, Now))
      .groupBy(col("warehouse_id"), col("warehouse_name"))
      .agg((sum(col("credits_used")) / 28.0).as("avg_credits_used"))
    val last2 = meter.filter(win(col("start_time"), D2, Now))
      .groupBy(col("warehouse_id"), col("warehouse_name"))
      .agg(sum(col("credits_used")).as("ld_credits_used"))
    last2.join(avg28, Seq("warehouse_id", "warehouse_name"))
      .filter(col("ld_credits_used") > col("avg_credits_used") * multiplier)
      .select(col("warehouse_id"), col("warehouse_name"),
        Num.r4(col("ld_credits_used")).as("ld_credits_used"),
        Num.r4(col("avg_credits_used")).as("avg_credits_used"))
  }

  /** The three fixed-window spend rules of snowflake_cost_management.sql
    * share one shape: derive a (key, credits, end_time) usage view from
    * events, SUM credits per key inside the window, alert above the
    * reference's 10-credit threshold. One map-side-combined aggregation
    * over a pruned time slice — linear, shuffle carries one row per key. */
  private def spendOver(usage: DataFrame, idCol: String, nameCol: String,
      creditCol: String, from: String, creditsOver: Double): DataFrame =
    usage.filter(win(col("end_time"), from, Now))
      .groupBy(col(idCol), col(nameCol))
      .agg(Num.r4(sum(col("__credits"))).as(creditCol))
      .filter(col(creditCol) > creditsOver)

  /** snowflake_cost_management.sql:1-16 — Automatic Clustering Spend:
    * tables whose auto-clustering credits exceed 10 in the past 5 hours.
    * The clustering-history view derives table/credits from events
    * deterministically (divisor calibrated so the threshold binds
    * non-trivially on the synthetic volume). */
  def clusteringSpend(events: DataFrame, creditsOver: Double = 10.0): DataFrame =
    spendOver(events.select(
        (col("user_id") % 12).as("table_id"),
        concat_ws("", lit("t"), col("user_id") % 12).as("table_name"),
        (col("value") / 20.0).as("__credits"),
        col("ts").as("end_time")),
      "table_id", "table_name", "credits", H5, creditsOver)

  /** snowflake_cost_management.sql:18-31 — Materialized View Spend:
    * same 5-hour window over the MV refresh history view. */
  def mvRefreshSpend(events: DataFrame, creditsOver: Double = 10.0): DataFrame =
    spendOver(events.select(
        ((col("user_id") + 5) % 9).as("table_id"),
        concat_ws("", lit("mv"), (col("user_id") + 5) % 9).as("table_name"),
        (col("value") / 25.0).as("__credits"),
        col("ts").as("end_time")),
      "table_id", "table_name", "credits", H5, creditsOver)

  /** snowflake_cost_management.sql:33-48 — Snowpipe Spend: 12-hour
    * window over the pipe usage history view. */
  def pipeSpend(events: DataFrame, creditsOver: Double = 10.0): DataFrame =
    spendOver(events.select(
        (col("user_id") % 5).as("pipe_id"),
        concat_ws("", lit("pipe"), col("user_id") % 5).as("pipe_name"),
        (col("value") / 130.0).as("__credits"),
        col("ts").as("end_time")),
      "pipe_id", "pipe_name", "credits_used", H12, creditsOver)

  /** snowflake_query_pack.sql:1-23 snowflake_admin_role_grant_monitor:
    * successful GRANTs of securityadmin/accountadmin; the granted object
    * is REGEXP-extracted from the query text exactly like the reference
    * view. */
  val adminRoleGrant: AlertRule = {
    val grantee = regexp_extract(col("query_text"),
      "(?i)\\s([^\\s]+)\\sto\\s", 1)
    AlertRule(
      name = "snowflake_admin_role_grant_monitor",
      queryId = "c77cf311de094a0ab9599917d6d0c644",
      title = "Snowflake ADMIN Role Granted",
      predicate = col("query_type") === "GRANT" &&
        col("execution_status") === "SUCCESS" &&
        (lower(grantee).contains("securityadmin") ||
          lower(grantee).contains("accountadmin")),
      actor = col("user_name"),
      target = grantee,
      action = lit("Granted Admin role"),
      description = concat_ws("", lit("A new grant was added "),
        lower(regexp_extract(col("query_text"),
          "(?i)\\s(to\\s[^\\s]+\\s[^\\s]+);?", 1)),
        lit(" by user "), col("user_name"),
        lit(" using role "), col("role_name")),
      severity = lit("Medium"),
      eventTime = col("start_time"),
      eventData = col("query_text"),
      environment = "snowflake",
      sources = "snowflake",
      detector = "SnowAlert")
  }

  /** snowflake_query_pack.sql:27-46 snowflake_authorization_error:
    * access-control error codes from query history. */
  val authorizationError: AlertRule = AlertRule(
    name = "snowflake_authorization_error",
    queryId = "b0724d64b40d4506b7bc4e0caedd1442",
    title = "Snowflake Access Control Error",
    predicate = col("error_code")
      .isin(1063, 3001, 3003, 3005, 3007, 3011, 3041),
    actor = col("user_name"),
    target = lit("Snowflake Query"),
    action = lit("Received an authorization error"),
    description = concat_ws("", lit("User "), col("user_name"),
      lit(" received "), col("error_message")),
    severity = lit("Low"),
    eventTime = col("start_time"),
    eventData = col("error_message"),
    environment = "snowflake",
    sources = "snowflake",
    detector = "SnowAlert")

  /** snowflake_security_monitoring.sql:49-59 (password changes),
    * :61-70 (new users), :37-47 (sensitive-role ALTERs): the reference
    * emits the raw query_history projection for analyst review. */
  private def qhProjection(filtered: DataFrame): DataFrame =
    filtered.select(col("query_id"), col("query_text"), col("user_name"),
      col("role_name"), col("start_time").cast("long").as("start_time_s"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sf_ip_login_fails" -> ((s: SparkSession, dir: String) =>
      ipLoginFails(lh(s, dir))
        .orderBy(col("client_ip"), col("reported_client_type"))),

    "q_pack_sf_user_login_fails" -> ((s: SparkSession, dir: String) =>
      userLoginFails(lh(s, dir), countsOver = 1)
        .orderBy(col("user_name"), col("reported_client_type"))),

    "q_pack_sf_no_mfa_login" -> ((s: SparkSession, dir: String) =>
      noMfaLogins(lh(s, dir)).orderBy(col("event_id"))
        .withColumn("event_timestamp",
          col("event_timestamp").cast("long"))
        .withColumnRenamed("event_timestamp", "event_time_s")),

    "q_pack_sf_query_spike" -> ((s: SparkSession, dir: String) =>
      querySpike(qh(s, dir), multiplier = 2.0)
        .orderBy(col("user_name"))),

    "q_pack_cost_warehouse_spike" -> ((s: SparkSession, dir: String) =>
      warehouseSpike(t(s, dir, "events"))
        .orderBy(col("warehouse_id"))),

    "q_pack_cost_clustering_spend" -> ((s: SparkSession, dir: String) =>
      clusteringSpend(t(s, dir, "events")).orderBy(col("table_id"))),

    "q_pack_cost_mv_spend" -> ((s: SparkSession, dir: String) =>
      mvRefreshSpend(t(s, dir, "events")).orderBy(col("table_id"))),

    "q_pack_cost_pipe_spend" -> ((s: SparkSession, dir: String) =>
      pipeSpend(t(s, dir, "events")).orderBy(col("pipe_id"))),

    "q_pack_sf_admin_role_grant" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runAlertRule(qh(s, dir), adminRoleGrant, col("query_id"),
        From, Now, AlertTimeS).orderBy(col("alert_id"))),

    "q_pack_sf_authz_error" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runAlertRule(qh(s, dir), authorizationError,
        col("query_id"), From, Now, AlertTimeS).orderBy(col("alert_id"))),

    "q_pack_sf_password_change" -> ((s: SparkSession, dir: String) =>
      qhProjection(qh(s, dir).filter(col("query_type") === "ALTER_USER" &&
        lower(col("query_text")).contains("password")))
        .orderBy(col("query_id"))),

    "q_pack_sf_new_user" -> ((s: SparkSession, dir: String) =>
      qhProjection(qh(s, dir).filter(col("query_type") === "CREATE_USER"))
        .orderBy(col("query_id"))),

    "q_pack_sf_sensitive_role_change" -> ((s: SparkSession, dir: String) =>
      qhProjection(qh(s, dir).filter(col("query_type") === "ALTER_USER" &&
        lower(col("query_text")).contains("admin")))
        .orderBy(col("query_id")))
  )

  /** DuckDB mirror of [[spendOver]] over the same derived usage view. */
  private def spendSql(idExpr: String, nameExpr: String, idCol: String,
      nameCol: String, div: String, creditCol: String, from: String): String =
    s"""WITH usage AS (
       |  SELECT $idExpr AS $idCol, $nameExpr AS $nameCol,
       |    value / $div AS credits, ts AS end_time
       |  FROM events
       |)
       |SELECT $idCol, $nameCol, round(sum(credits), 4) AS $creditCol
       |FROM usage
       |WHERE end_time >= TIMESTAMP '$from' AND end_time < TIMESTAMP '$Now'
       |GROUP BY 1, 2
       |HAVING round(sum(credits), 4) > 10.0
       |ORDER BY $idCol""".stripMargin

  private def loginAggSql(
      groupCols: String, from: String, countsOver: Long): String =
    s"""${SnowflakePack.LoginCte}
       |SELECT $groupCols,
       |  array_to_string(list_sort(list(DISTINCT CAST(error_code AS VARCHAR))), ',')
       |    AS error_codes,
       |  array_to_string(list_sort(list(DISTINCT error_message)), ',')
       |    AS error_messages,
       |  count(event_id) AS counts
       |FROM lh
       |WHERE error_code IS NOT NULL
       |  AND event_timestamp >= TIMESTAMP '$from'
       |  AND event_timestamp < TIMESTAMP '$Now'
       |GROUP BY $groupCols
       |HAVING count(event_id) > $countsOver
       |ORDER BY $groupCols""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_pack_sf_ip_login_fails" ->
      loginAggSql("client_ip, reported_client_type", H24, 5),

    "q_pack_sf_user_login_fails" ->
      loginAggSql("user_name, reported_client_type", H12, 1),

    "q_pack_sf_no_mfa_login" ->
      s"""${SnowflakePack.LoginCte}
         |SELECT event_id,
         |  epoch_ns(event_timestamp) // 1000000000 AS event_time_s,
         |  user_name, client_ip, reported_client_type,
         |  first_authentication_factor, second_authentication_factor
         |FROM lh
         |WHERE second_authentication_factor IS NULL
         |  AND reported_client_type IN ('SNOWFLAKE_UI', 'OTHER')
         |  AND event_timestamp >= TIMESTAMP '$H24'
         |  AND event_timestamp < TIMESTAMP '$Now'
         |ORDER BY event_id""".stripMargin,

    "q_pack_sf_query_spike" ->
      s"""$QhCte, avg28 AS (
         |  SELECT user_name, count(query_id) / 28.0 AS avg_queries
         |  FROM qh
         |  WHERE start_time >= TIMESTAMP '$D28'
         |    AND start_time < TIMESTAMP '$Now'
         |  GROUP BY 1
         |), last2 AS (
         |  SELECT user_name, count(query_id) AS ld_queries
         |  FROM qh
         |  WHERE start_time >= TIMESTAMP '$D2'
         |    AND start_time < TIMESTAMP '$Now'
         |  GROUP BY 1
         |)
         |SELECT l.user_name, l.ld_queries, round(a.avg_queries, 4) AS avg_queries
         |FROM last2 l JOIN avg28 a USING (user_name)
         |WHERE l.ld_queries > a.avg_queries * 2.0
         |ORDER BY l.user_name""".stripMargin,

    "q_pack_cost_warehouse_spike" ->
      s"""WITH meter AS (
         |  SELECT user_id % 8 AS warehouse_id,
         |    'wh' || (user_id % 8) AS warehouse_name,
         |    value / 100.0 AS credits_used,
         |    ts AS start_time
         |  FROM events
         |), avg28 AS (
         |  SELECT warehouse_id, warehouse_name,
         |    sum(credits_used) / 28.0 AS avg_credits_used
         |  FROM meter
         |  WHERE start_time >= TIMESTAMP '$D28'
         |    AND start_time < TIMESTAMP '$Now'
         |  GROUP BY 1, 2
         |), last2 AS (
         |  SELECT warehouse_id, warehouse_name,
         |    sum(credits_used) AS ld_credits_used
         |  FROM meter
         |  WHERE start_time >= TIMESTAMP '$D2'
         |    AND start_time < TIMESTAMP '$Now'
         |  GROUP BY 1, 2
         |)
         |SELECT l.warehouse_id, l.warehouse_name,
         |  round(l.ld_credits_used, 4) AS ld_credits_used,
         |  round(a.avg_credits_used, 4) AS avg_credits_used
         |FROM last2 l JOIN avg28 a USING (warehouse_id, warehouse_name)
         |WHERE l.ld_credits_used > a.avg_credits_used * 2.0
         |ORDER BY l.warehouse_id""".stripMargin,

    "q_pack_cost_clustering_spend" ->
      spendSql("user_id % 12", "'t' || (user_id % 12)",
        "table_id", "table_name", "20.0", "credits", H5),

    "q_pack_cost_mv_spend" ->
      spendSql("(user_id + 5) % 9", "'mv' || ((user_id + 5) % 9)",
        "table_id", "table_name", "25.0", "credits", H5),

    "q_pack_cost_pipe_spend" ->
      spendSql("user_id % 5", "'pipe' || (user_id % 5)",
        "pipe_id", "pipe_name", "130.0", "credits_used", H12),

    "q_pack_sf_admin_role_grant" ->
      s"""$QhCte
         |SELECT
         |  md5('snowflake_admin_role_grant_monitor:' || query_id)
         |    AS alert_id,
         |  'snowflake_admin_role_grant_monitor' AS query_name,
         |  'c77cf311de094a0ab9599917d6d0c644' AS query_id,
         |  'snowflake' AS environment, 'snowflake' AS sources,
         |  user_name AS actor,
         |  regexp_extract(query_text, '(?i)\\s([^\\s]+)\\sto\\s', 1)
         |    AS object,
         |  'Granted Admin role' AS action,
         |  'Snowflake ADMIN Role Granted' AS title,
         |  epoch_ns(start_time) // 1000000000 AS event_time_s,
         |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
         |  'A new grant was added ' ||
         |    lower(regexp_extract(query_text,
         |      '(?i)\\s(to\\s[^\\s]+\\s[^\\s]+);?', 1)) ||
         |    ' by user ' || user_name || ' using role ' || role_name
         |    AS description,
         |  'SnowAlert' AS detector, query_text AS event_data,
         |  'Medium' AS severity, CAST(1 AS BIGINT) AS counter
         |FROM qh
         |WHERE query_type = 'GRANT' AND execution_status = 'SUCCESS'
         |  AND (lower(regexp_extract(query_text, '(?i)\\s([^\\s]+)\\sto\\s', 1))
         |         LIKE '%securityadmin%'
         |       OR lower(regexp_extract(query_text, '(?i)\\s([^\\s]+)\\sto\\s', 1))
         |         LIKE '%accountadmin%')
         |  AND start_time >= TIMESTAMP '$From'
         |  AND start_time < TIMESTAMP '$Now'
         |ORDER BY alert_id""".stripMargin,

    "q_pack_sf_authz_error" ->
      s"""$QhCte
         |SELECT
         |  md5('snowflake_authorization_error:' || query_id) AS alert_id,
         |  'snowflake_authorization_error' AS query_name,
         |  'b0724d64b40d4506b7bc4e0caedd1442' AS query_id,
         |  'snowflake' AS environment, 'snowflake' AS sources,
         |  user_name AS actor, 'Snowflake Query' AS object,
         |  'Received an authorization error' AS action,
         |  'Snowflake Access Control Error' AS title,
         |  epoch_ns(start_time) // 1000000000 AS event_time_s,
         |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
         |  'User ' || user_name || ' received ' || error_message
         |    AS description,
         |  'SnowAlert' AS detector, error_message AS event_data,
         |  'Low' AS severity, CAST(1 AS BIGINT) AS counter
         |FROM qh
         |WHERE error_code IN (1063, 3001, 3003, 3005, 3007, 3011, 3041)
         |  AND start_time >= TIMESTAMP '$From'
         |  AND start_time < TIMESTAMP '$Now'
         |ORDER BY alert_id""".stripMargin,

    "q_pack_sf_password_change" ->
      s"""$QhCte
         |SELECT query_id, query_text, user_name, role_name,
         |  epoch_ns(start_time) // 1000000000 AS start_time_s
         |FROM qh
         |WHERE query_type = 'ALTER_USER'
         |  AND lower(query_text) LIKE '%password%'
         |ORDER BY query_id""".stripMargin,

    "q_pack_sf_new_user" ->
      s"""$QhCte
         |SELECT query_id, query_text, user_name, role_name,
         |  epoch_ns(start_time) // 1000000000 AS start_time_s
         |FROM qh
         |WHERE query_type = 'CREATE_USER'
         |ORDER BY query_id""".stripMargin,

    "q_pack_sf_sensitive_role_change" ->
      s"""$QhCte
         |SELECT query_id, query_text, user_name, role_name,
         |  epoch_ns(start_time) // 1000000000 AS start_time_s
         |FROM qh
         |WHERE query_type = 'ALTER_USER'
         |  AND lower(query_text) LIKE '%admin%'
         |ORDER BY query_id""".stripMargin
  )
}
