package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Num, Tables}
import graft.engine.{RuleEngine, ViolationRule}

/** packs/osquery_query_pack.sql:1-40 missing_server_osquery_logs: an
  * instance-inventory snapshot LEFT-ANTI-joined against the last hour of
  * osquery logs — running servers that shipped no logs are violations.
  * The inventory is the distinct-user fleet derived from `events`; log
  * presence is event activity in the final hour. */
object OsqueryPack {
  import Tables.t

  private val H1 = "2024-01-30 11:00:00"
  private val Now = "2024-01-30 12:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_osquery_missing_logs" -> ((s: SparkSession, dir: String) => {
      val events = t(s, dir, "events")
      // fleet snapshot: one instance per user; every 10th stopped, every
      // 10th+1 terminated (excluded like the reference's state filter)
      val instances = events.select(col("user_id")).distinct()
        .select(
          concat_ws("", lit("i-"), col("user_id")).as("instance_id"),
          when(col("user_id") % 10 === 0, "stopped")
            .when(col("user_id") % 10 === 1, "terminated")
            .otherwise("running").as("state"))
      val loggedRecently = events
        .filter(col("ts") >= lit(H1).cast("timestamp") &&
          col("ts") < lit(Now).cast("timestamp"))
        .select(concat_ws("", lit("i-"), col("user_id")).as("instance_id"))
        .distinct()
      val missing = instances
        .filter(!col("state").isin("stopped", "terminated"))
        .join(loggedRecently, Seq("instance_id"), "left_anti")
      RuleEngine.runViolationRule(missing, ViolationRule(
        name = "missing_server_osquery_logs",
        queryId = "2060a772e50e4a4598808cdb76d2a315",
        title = "Missing osquery agent logs",
        predicate = lit(true),
        target = col("instance_id"),
        owner = lit("secops"),
        severity = lit("medium"),
        day = lit("2024-01-30").cast("date"))).orderBy(col("id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_pack_osquery_missing_logs" ->
      s"""WITH instances AS (
         |  SELECT DISTINCT 'i-' || user_id AS instance_id,
         |    CASE WHEN user_id % 10 = 0 THEN 'stopped'
         |         WHEN user_id % 10 = 1 THEN 'terminated'
         |         ELSE 'running' END AS state
         |  FROM events
         |), logged AS (
         |  SELECT DISTINCT 'i-' || user_id AS instance_id
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$H1' AND ts < TIMESTAMP '$Now'
         |)
         |SELECT
         |  md5('missing_server_osquery_logs|' || i.instance_id ||
         |      '|Missing osquery agent logs|2024-01-30') AS id,
         |  'missing_server_osquery_logs' AS query_name,
         |  '2060a772e50e4a4598808cdb76d2a315' AS query_id,
         |  'Missing osquery agent logs' AS title,
         |  i.instance_id AS object, 'secops' AS owner,
         |  'medium' AS severity, DATE '2024-01-30' AS violation_day
         |FROM instances i
         |WHERE i.state NOT IN ('stopped', 'terminated')
         |  AND i.instance_id NOT IN (SELECT instance_id FROM logged)
         |ORDER BY id""".stripMargin
  )
}

/** packs/umbrella_query_pack.sql:1-39 recurring_c2_activity_ratio: per
  * hostname, the fraction of 6-hour slices in the last 24h containing
  * allowed Malware-categorized lookups; ratio > 0.3 alerts. The
  * reference builds the slice grid with a FULL JOIN against a slice
  * table; here the ratio is count(DISTINCT active slice)/4 — same
  * number, one aggregation, no grid materialization. */
object UmbrellaPack {
  import Tables.t

  private val From24 = "2024-01-29 12:00:00"
  private val Now = "2024-01-30 12:00:00"

  /** umbrella-log-shaped view: view events as DNS lookups; low-value
    * lookups are Malware-categorized but Allowed. */
  def umbrellaFromEvents(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "view")
      .select(
        col("event_id").cast("string").as("uuid"),
        col("ts").as("event_ts"),
        concat_ws("", lit("h"), col("user_id") % 2).as("hostname"),
        when(col("value") < 60.0, "Malware").otherwise("Benign")
          .as("categories"),
        lit("Allowed").as("action"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_umbrella_c2" -> ((s: SparkSession, dir: String) =>
      umbrellaFromEvents(t(s, dir, "events"))
        .filter(col("categories") === "Malware" &&
          col("action") === "Allowed" &&
          col("event_ts") >= lit(From24).cast("timestamp") &&
          col("event_ts") < lit(Now).cast("timestamp"))
        .withColumn("hr", timestamp_seconds(
          floor(unix_timestamp(col("event_ts")) / 21600) * 21600))
        .groupBy(col("hostname"))
        .agg(
          (count_distinct(col("hr")) / 4.0).as("ratio"),
          (max(col("hr")) + expr("INTERVAL 6 HOURS")).cast("long")
            .as("event_time_s"))
        .filter(col("ratio") > 0.3)
        .select(
          lit("Recurring C2 Communication Allowed by Umbrella").as("title"),
          col("hostname").as("object"),
          col("hostname").as("actor"),
          lit("DNS Lookup").as("action"),
          col("event_time_s"),
          concat_ws("",
            lit("Cisco Umbrella is reporting recurring unblocked C2 activity at "),
            col("hostname")).as("description"),
          lit("high").as("severity"),
          Num.r4(col("ratio")).as("c2_activity_ratio"))
        .orderBy(col("object")))
  )

  def oracle: Map[String, String] = Map(
    "q_pack_umbrella_c2" ->
      s"""WITH um AS (
         |  SELECT CAST(event_id AS VARCHAR) AS uuid, ts AS event_ts,
         |    'h' || (user_id % 2) AS hostname,
         |    CASE WHEN value < 60.0 THEN 'Malware' ELSE 'Benign' END
         |      AS categories,
         |    'Allowed' AS action
         |  FROM events WHERE event_type = 'view'
         |), agg AS (
         |  SELECT hostname,
         |    count(DISTINCT time_bucket(INTERVAL '6 hours', event_ts))
         |      / 4.0 AS ratio,
         |    epoch_ns(max(time_bucket(INTERVAL '6 hours', event_ts))
         |      + INTERVAL 6 HOURS) // 1000000000 AS event_time_s
         |  FROM um
         |  WHERE categories = 'Malware' AND action = 'Allowed'
         |    AND event_ts >= TIMESTAMP '$From24'
         |    AND event_ts < TIMESTAMP '$Now'
         |  GROUP BY hostname
         |)
         |SELECT 'Recurring C2 Communication Allowed by Umbrella' AS title,
         |  hostname AS object, hostname AS actor,
         |  'DNS Lookup' AS action, event_time_s,
         |  'Cisco Umbrella is reporting recurring unblocked C2 activity at '
         |    || hostname AS description,
         |  'high' AS severity,
         |  round(ratio, 4) AS c2_activity_ratio
         |FROM agg WHERE ratio > 0.3
         |ORDER BY object""".stripMargin
  )
}

/** packs/cis_azure_pack.sql representative violations (the 2,233-line
  * pack is ~40 rules of one shape: filter an azure_collect snapshot
  * view, emit an identity-hashed violation). Three canonical instances:
  * CIS 1.1 (privileged users without MFA, :1-69), CIS 1.3 (guest
  * accounts, :141-168), CIS 3.1 (storage accounts allowing non-HTTPS
  * transfer, :1055-1099) — over deterministic user/storage views derived
  * from `customer`/`supplier`. */
object AzureCisPack {
  import Tables.t

  private val Day = "2024-01-30"

  /** azure_collect_users-shaped view (upn, display, MFA registration,
    * role, member type). */
  def usersFromCustomer(customer: DataFrame): DataFrame =
    customer.select(
      lit("t1").as("tenant_id"),
      concat_ws("", lit("u"), col("c_custkey"), lit("@corp.example"))
        .as("user_principal_name"),
      col("c_name").as("user_display_name"),
      (col("c_custkey") % 4 =!= 0).as("is_mfa_registered"),
      when(col("c_custkey") % 5 === 0, "Owner")
        .when(col("c_custkey") % 5 === 1, "Contributor")
        .when(col("c_custkey") % 5 === 2, "Security Admin")
        .otherwise("Reader").as("role_name"),
      when(col("c_custkey") % 7 === 0, "Guest").otherwise("Member")
        .as("user_type"))

  private val UsersCte =
    """WITH users AS (
      |  SELECT 't1' AS tenant_id,
      |    'u' || c_custkey || '@corp.example' AS user_principal_name,
      |    c_name AS user_display_name,
      |    (c_custkey % 4 <> 0) AS is_mfa_registered,
      |    CASE WHEN c_custkey % 5 = 0 THEN 'Owner'
      |         WHEN c_custkey % 5 = 1 THEN 'Contributor'
      |         WHEN c_custkey % 5 = 2 THEN 'Security Admin'
      |         ELSE 'Reader' END AS role_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'Guest' ELSE 'Member' END
      |      AS user_type
      |  FROM customer
      |)""".stripMargin

  /** The reference's object shape: 'User `upn`(display)'. */
  private def userObject = concat_ws("", lit("User `"),
    col("user_principal_name"), lit("`("), col("user_display_name"),
    lit(")"))

  private val UserObjectSql =
    "'User `' || user_principal_name || '`(' || user_display_name || ')'"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CIS 1.1: privileged roles (Owner / *Contributor per the reference
    // role-name patterns) must have MFA registered.
    "q_pack_azure_cis_mfa_privileged" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runViolationRule(
        usersFromCustomer(t(s, dir, "customer")),
        ViolationRule(
          name = "azure_cis_1_1",
          queryId = "R6Q4AB22WH9",
          title = "Azure CIS 1.1: Enable MFA for privileged users",
          predicate = !col("is_mfa_registered") &&
            (col("role_name").endsWith("Contributor") ||
              lower(col("role_name")) === "owner"),
          target = userObject,
          owner = lit("devsecops"),
          severity = lit("High"),
          day = lit(Day).cast("date"))).orderBy(col("id"))),

    // CIS 1.3: guest accounts reviewed as violations.
    "q_pack_azure_cis_guest_users" -> ((s: SparkSession, dir: String) =>
      RuleEngine.runViolationRule(
        usersFromCustomer(t(s, dir, "customer")),
        ViolationRule(
          name = "azure_cis_1_3",
          queryId = "G3QUVB22WH1",
          title = "Azure CIS 1.3: Review guest users",
          predicate = col("user_type") === "Guest",
          target = userObject,
          owner = lit("devsecops"),
          severity = lit("Medium"),
          day = lit(Day).cast("date"))).orderBy(col("id"))),

    // CIS 3.1: storage accounts must require secure (HTTPS) transfer.
    "q_pack_azure_cis_storage_https" -> ((s: SparkSession, dir: String) => {
      val storage = t(s, dir, "supplier").select(
        concat_ws("", lit("sa"), col("s_suppkey")).as("account_name"),
        (col("s_suppkey") % 3 =!= 0).as("supports_https_traffic_only"))
      RuleEngine.runViolationRule(storage, ViolationRule(
        name = "azure_cis_3_1",
        queryId = "S7QHVB22WH3",
        title = "Azure CIS 3.1: Require secure transfer",
        predicate = !col("supports_https_traffic_only"),
        target = col("account_name"),
        owner = lit("devsecops"),
        severity = lit("High"),
        day = lit(Day).cast("date"))).orderBy(col("id"))
    })
  )

  private def violationSql(
      cte: String, from: String, name: String, queryId: String,
      title: String, obj: String, where: String, severity: String): String =
    s"""$cte
       |SELECT
       |  md5('$name|' || $obj || '|$title|$Day') AS id,
       |  '$name' AS query_name, '$queryId' AS query_id,
       |  '$title' AS title,
       |  $obj AS object, 'devsecops' AS owner,
       |  '$severity' AS severity, DATE '$Day' AS violation_day
       |FROM $from
       |WHERE $where
       |ORDER BY id""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_pack_azure_cis_mfa_privileged" -> violationSql(
      UsersCte, "users", "azure_cis_1_1", "R6Q4AB22WH9",
      "Azure CIS 1.1: Enable MFA for privileged users", UserObjectSql,
      """NOT is_mfa_registered
        |  AND (role_name LIKE '%Contributor' OR lower(role_name) = 'owner')"""
        .stripMargin,
      "High"),

    "q_pack_azure_cis_guest_users" -> violationSql(
      UsersCte, "users", "azure_cis_1_3", "G3QUVB22WH1",
      "Azure CIS 1.3: Review guest users", UserObjectSql,
      "user_type = 'Guest'", "Medium"),

    "q_pack_azure_cis_storage_https" -> violationSql(
      """WITH storage AS (
        |  SELECT 'sa' || s_suppkey AS account_name,
        |    (s_suppkey % 3 <> 0) AS supports_https_traffic_only
        |  FROM supplier
        |)""".stripMargin,
      "storage", "azure_cis_3_1", "S7QHVB22WH3",
      "Azure CIS 3.1: Require secure transfer", "account_name",
      "NOT supports_https_traffic_only", "High")
  )
}
