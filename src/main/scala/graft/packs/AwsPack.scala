package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{AlertRule, RuleEngine, ViolationRule}
import graft.sources.CloudTrail

/** Real pack rules ported onto the AlertRule/ViolationRule API, proving
  * the rule surface expresses the reference's shipped query packs
  * (packs/aws_query_pack.sql, packs/cis_aws_pack.sql). The rules run
  * over the CloudTrail-shaped view derived from `events`
  * (CloudTrail.fromEvents) so each has a full DuckDB oracle.
  */
object AwsPack {
  import Tables.t

  private val From = "2024-01-01 00:00:00"
  private val To = "2024-02-01 00:00:00"
  private val AlertTimeS = 1706745600L // 2024-02-01T00:00:00Z

  /** packs/aws_query_pack.sql:87-115 aws_root_account_activity:
    * Root-identity API calls not from AWS support. */
  val rootAccountActivity: AlertRule = AlertRule(
    name = "aws_root_account_activity",
    queryId = "2337ac7e963f4ef89252834ae877258f",
    title = "AWS Root Account Activity",
    predicate = col("user_identity_type") === "Root" &&
      col("source_ip_address") =!= "support.amazonaws.com",
    actor = lit("Root"),
    target = col("recipient_account_id"),
    action = col("event_name"),
    description = concat_ws("", lit("Root user performed "),
      col("event_name"), lit(" at account "),
      col("recipient_account_id")),
    severity = lit("High"),
    eventTime = col("event_time"),
    eventData = col("raw"),
    environment = "aws",
    sources = "cloudtrail",
    detector = "SnowAlert")

  /** packs/aws_query_pack.sql:34-83 aws_permission_modification_denied:
    * AccessDenied on administrative IAM events. */
  val permissionModificationDenied: AlertRule = AlertRule(
    name = "aws_permission_modification_denied",
    queryId = "dad7800f08ba4789a47d6d519be42886",
    title = "AWS Permission Modification Denied",
    predicate = col("error_code") === "AccessDenied" &&
      col("event_name").isin("AddUserToGroup", "AttachRolePolicy",
        "CreateAccessKey", "CreateUser", "DeleteUser", "DeleteUserPolicy"),
    actor = col("user_identity_arn"),
    target = col("user_identity_arn"),
    action = col("event_name"),
    description = col("error_message"),
    severity = lit("medium"),
    eventTime = col("event_time"),
    eventData = col("raw"),
    environment = "aws",
    sources = "cloudtrail",
    detector = "SnowAlert")

  /** packs/aws_query_pack.sql:1-31 aws_audit_log_configuration_changes:
    * CloudTrail logging tampered with (DeleteTrail/StopLogging/
    * UpdateTrail). */
  val auditLogConfigurationChanges: AlertRule = AlertRule(
    name = "aws_audit_log_configuration_changes",
    queryId = "5a9dd7ca57954c0f9b03522a2869c1f7",
    title = "AWS Audit Log Configuration Changes",
    predicate =
      col("event_name").isin("DeleteTrail", "StopLogging", "UpdateTrail"),
    actor = col("user_identity_arn"),
    target = col("recipient_account_id"),
    action = col("event_name"),
    description = concat_ws("", col("user_identity_arn"),
      lit(" performed "), col("event_name"), lit(" in "),
      col("aws_region")),
    severity = lit("High"),
    eventTime = col("event_time"),
    eventData = col("raw"),
    environment = "aws",
    sources = "cloudtrail",
    detector = "SnowAlert")

  private def ct(s: SparkSession, dir: String): DataFrame =
    CloudTrail.sharedFromEvents(s, dir)

  /** packs/aws_query_pack.sql:116-147 aws_internal_bucket_access:
    * S3 access to a non-public bucket by an account NOT in the known
    * account map — the reference's `NOT IN (SELECT account_id FROM
    * aws_account_map)` re-expressed as a broadcast LEFT ANTI join (the
    * account map is a small dimension; the event scan never shuffles). */
  def internalBucketAccess(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val accountMap = Seq("111122223333", "444455556666").toDF("account_id")
    val externalS3 = ct(s, dir)
      .filter(col("bucket_name").isNotNull &&
        !col("bucket_name").endsWith("-public"))
      .join(broadcast(accountMap),
        col("user_identity_accountid") === col("account_id"), "left_anti")
    RuleEngine.runAlertRule(externalS3, AlertRule(
      name = "aws_internal_bucket_access",
      queryId = "1fda47b046ac4030a7cc7de536941e8a",
      title = "Internal Bucket Accessed By External Account",
      predicate = lit(true),
      actor = col("user_identity_accountid"),
      target = col("bucket_name"),
      action = col("event_name"),
      description = concat_ws("", lit("User from external account "),
        col("user_identity_accountid"), lit(" performed "),
        col("event_name"), lit(" at non-public bucket "),
        col("bucket_name")),
      severity = lit("critical"),
      eventTime = col("event_time"),
      eventData = col("raw"),
      environment = "aws",
      sources = "cloudtrail",
      detector = "SnowAlert"), col("event_id"),
      From, To, AlertTimeS).orderBy(col("alert_id"))
  }

  private def alertsFor(rule: AlertRule)(s: SparkSession, dir: String) =
    RuleEngine.runAlertRule(ct(s, dir), rule, col("event_id"),
      From, To, AlertTimeS).orderBy(col("alert_id"))

  /** packs/cis_aws_pack.sql-style violation: IAM-user API activity
    * without MFA, one violation per (identity, day) with the
    * reference's identity-hash id (db.py INSERT_VIOLATIONS_WITH_ID). */
  def mfaViolations(s: SparkSession, dir: String): DataFrame = {
    val daily = ct(s, dir)
      .filter(col("user_identity_type") === "IAMUser" &&
        !col("mfa_authenticated"))
      .groupBy(col("user_identity_arn"),
        col("event_time").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    RuleEngine.runViolationRule(daily, ViolationRule(
      name = "cis_aws_no_mfa_activity",
      queryId = "gvcis01",
      title = "IAM API activity without MFA",
      predicate = col("n") >= 3,
      target = col("user_identity_arn"),
      owner = lit("secops"),
      severity = when(col("n") >= 6, "high").otherwise("medium"),
      day = col("day"))).orderBy(col("id"))
  }

  /** packs/cis_aws_pack.sql:51-107 AWS CIS 1.3 — credentials unused for
    * N days: the login-profile user set LEFT-ANTI-joined against recent
    * sign-in activity (reference N=90; instantiated at 1 for the 30-day
    * synthetic span). */
  def staleCredentials(
      s: SparkSession, dir: String, days: Int = 1): DataFrame = {
    val now = "2024-01-30 12:00:00"
    val ctv = ct(s, dir)
    val users = ctv.select(col("user_identity_username").as("user_name"))
      .distinct()
    val recent = ctv
      .filter(col("event_time") >=
        lit(now).cast("timestamp") - expr(s"INTERVAL $days DAYS") &&
        col("event_time") < lit(now).cast("timestamp"))
      .select(col("user_identity_username").as("user_name"))
      .distinct()
    RuleEngine.runViolationRule(
      users.join(recent, Seq("user_name"), "left_anti"),
      ViolationRule(
        name = "cis_aws_1_3_stale_credentials",
        queryId = "GVR3N9WQLGG",
        title = "AWS CIS 1.3: Ensure credentials unused for 90 days or greater are disabled",
        predicate = lit(true),
        target = col("user_name"),
        owner = lit("devsecops"),
        severity = lit("Medium"),
        day = lit("2024-01-30").cast("date"))).orderBy(col("id"))
  }

  /** packs/cis_aws_pack.sql:108-154 AWS CIS 1.4 — access keys rotated
    * every 90 days: key inventory with derived creation dates, keys
    * older than 90 days violate. */
  def keyRotation(s: SparkSession, dir: String): DataFrame = {
    val keys = ct(s, dir)
      .select(col("user_identity_username").as("user_name"),
        col("user_id")).distinct()
      .withColumn("access_key_id",
        concat_ws("", lit("AKIA"), upper(col("user_name"))))
      .withColumn("create_date",
        date_sub(lit("2024-01-01").cast("date"),
          (col("user_id") * 13 % 200).cast("int")))
      .withColumn("age_days",
        datediff(lit("2024-01-30").cast("date"), col("create_date")))
    RuleEngine.runViolationRule(keys, ViolationRule(
      name = "cis_aws_1_4_key_rotation",
      queryId = "WM00E51BLCE",
      title = "AWS CIS 1.4: Ensure access keys are rotated every 90 days or less",
      predicate = col("age_days") > 90,
      target = col("access_key_id"),
      owner = lit("devsecops"),
      severity = lit("Medium"),
      day = lit("2024-01-30").cast("date"))).orderBy(col("id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_aws_root_activity" -> alertsFor(rootAccountActivity) _,
    "q_pack_aws_permission_denied" ->
      alertsFor(permissionModificationDenied) _,
    "q_pack_aws_audit_log_changes" ->
      alertsFor(auditLogConfigurationChanges) _,
    "q_pack_cis_mfa_violation" -> (mfaViolations _),
    "q_pack_aws_bucket_access" -> (internalBucketAccess _),
    "q_pack_cis_stale_credentials" -> ((s: SparkSession, dir: String) =>
      staleCredentials(s, dir)),
    "q_pack_cis_key_rotation" -> (keyRotation _)
  )

  /** Oracle alert template mirroring runAlertRule's output schema. */
  private def alertSql(
      name: String, queryId: String, title: String, where: String,
      actor: String, obj: String, description: String,
      severity: String): String =
    s"""${CloudTrail.FromEventsCte}
       |SELECT md5('$name:' || event_id) AS alert_id,
       |  '$name' AS query_name, '$queryId' AS query_id,
       |  'aws' AS environment, 'cloudtrail' AS sources,
       |  $actor AS actor, $obj AS object, event_name AS action,
       |  '$title' AS title,
       |  epoch_ns(event_time) // 1000000000 AS event_time_s,
       |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
       |  $description AS description,
       |  'SnowAlert' AS detector, raw AS event_data,
       |  $severity AS severity, CAST(1 AS BIGINT) AS counter
       |FROM ct
       |WHERE ($where)
       |  AND event_time >= TIMESTAMP '2024-01-01'
       |  AND event_time < TIMESTAMP '2024-02-01'
       |ORDER BY alert_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_pack_aws_root_activity" -> alertSql(
      "aws_root_account_activity", "2337ac7e963f4ef89252834ae877258f",
      "AWS Root Account Activity",
      "user_identity_type = 'Root' AND source_ip_address <> 'support.amazonaws.com'",
      "'Root'", "recipient_account_id",
      "'Root user performed ' || event_name || ' at account ' || recipient_account_id",
      "'High'"),

    "q_pack_aws_permission_denied" -> alertSql(
      "aws_permission_modification_denied",
      "dad7800f08ba4789a47d6d519be42886",
      "AWS Permission Modification Denied",
      """error_code = 'AccessDenied' AND event_name IN
        |    ('AddUserToGroup', 'AttachRolePolicy', 'CreateAccessKey',
        |     'CreateUser', 'DeleteUser', 'DeleteUserPolicy')""".stripMargin,
      "user_identity_arn", "user_identity_arn", "error_message",
      "'medium'"),

    "q_pack_aws_audit_log_changes" -> alertSql(
      "aws_audit_log_configuration_changes",
      "5a9dd7ca57954c0f9b03522a2869c1f7",
      "AWS Audit Log Configuration Changes",
      "event_name IN ('DeleteTrail', 'StopLogging', 'UpdateTrail')",
      "user_identity_arn", "recipient_account_id",
      "user_identity_arn || ' performed ' || event_name || ' in ' || aws_region",
      "'High'"),

    "q_pack_aws_bucket_access" ->
      s"""${CloudTrail.FromEventsCte}
         |SELECT md5('aws_internal_bucket_access:' || event_id) AS alert_id,
         |  'aws_internal_bucket_access' AS query_name,
         |  '1fda47b046ac4030a7cc7de536941e8a' AS query_id,
         |  'aws' AS environment, 'cloudtrail' AS sources,
         |  user_identity_accountid AS actor, bucket_name AS object,
         |  event_name AS action,
         |  'Internal Bucket Accessed By External Account' AS title,
         |  epoch_ns(event_time) // 1000000000 AS event_time_s,
         |  CAST($AlertTimeS AS BIGINT) AS alert_time_s,
         |  'User from external account ' || user_identity_accountid ||
         |    ' performed ' || event_name || ' at non-public bucket ' ||
         |    bucket_name AS description,
         |  'SnowAlert' AS detector, raw AS event_data,
         |  'critical' AS severity, CAST(1 AS BIGINT) AS counter
         |FROM ct
         |WHERE bucket_name IS NOT NULL
         |  AND bucket_name NOT LIKE '%-public'
         |  AND user_identity_accountid NOT IN ('111122223333', '444455556666')
         |  AND event_time >= TIMESTAMP '2024-01-01'
         |  AND event_time < TIMESTAMP '2024-02-01'
         |ORDER BY alert_id""".stripMargin,

    "q_pack_cis_stale_credentials" ->
      s"""${CloudTrail.FromEventsCte}, users AS (
         |  SELECT DISTINCT user_identity_username AS user_name FROM ct
         |), recent AS (
         |  SELECT DISTINCT user_identity_username AS user_name FROM ct
         |  WHERE event_time >= TIMESTAMP '2024-01-30 12:00:00' - INTERVAL 1 DAY
         |    AND event_time < TIMESTAMP '2024-01-30 12:00:00'
         |)
         |SELECT
         |  md5('cis_aws_1_3_stale_credentials|' || u.user_name ||
         |      '|AWS CIS 1.3: Ensure credentials unused for 90 days or greater are disabled|2024-01-30')
         |    AS id,
         |  'cis_aws_1_3_stale_credentials' AS query_name,
         |  'GVR3N9WQLGG' AS query_id,
         |  'AWS CIS 1.3: Ensure credentials unused for 90 days or greater are disabled'
         |    AS title,
         |  u.user_name AS object, 'devsecops' AS owner,
         |  'Medium' AS severity, DATE '2024-01-30' AS violation_day
         |FROM users u
         |WHERE u.user_name NOT IN (SELECT user_name FROM recent)
         |ORDER BY id""".stripMargin,

    "q_pack_cis_key_rotation" ->
      s"""${CloudTrail.FromEventsCte}, keys AS (
         |  SELECT DISTINCT user_identity_username AS user_name, user_id
         |  FROM ct
         |), aged AS (
         |  SELECT 'AKIA' || upper(user_name) AS access_key_id,
         |    DATE '2024-01-01' - CAST((user_id * 13) % 200 AS INTEGER)
         |      AS create_date
         |  FROM keys
         |)
         |SELECT
         |  md5('cis_aws_1_4_key_rotation|' || access_key_id ||
         |      '|AWS CIS 1.4: Ensure access keys are rotated every 90 days or less|2024-01-30')
         |    AS id,
         |  'cis_aws_1_4_key_rotation' AS query_name,
         |  'WM00E51BLCE' AS query_id,
         |  'AWS CIS 1.4: Ensure access keys are rotated every 90 days or less'
         |    AS title,
         |  access_key_id AS object, 'devsecops' AS owner,
         |  'Medium' AS severity, DATE '2024-01-30' AS violation_day
         |FROM aged
         |WHERE date_diff('day', create_date, DATE '2024-01-30') > 90
         |ORDER BY id""".stripMargin,

    "q_pack_cis_mfa_violation" ->
      s"""${CloudTrail.FromEventsCte}, daily AS (
         |  SELECT user_identity_arn, CAST(event_time AS DATE) AS day,
         |    count(*) AS n
         |  FROM ct
         |  WHERE user_identity_type = 'IAMUser' AND NOT mfa_authenticated
         |  GROUP BY 1, 2
         |)
         |SELECT
         |  md5('cis_aws_no_mfa_activity|' || user_identity_arn ||
         |      '|IAM API activity without MFA|' || CAST(day AS VARCHAR))
         |    AS id,
         |  'cis_aws_no_mfa_activity' AS query_name, 'gvcis01' AS query_id,
         |  'IAM API activity without MFA' AS title,
         |  user_identity_arn AS object, 'secops' AS owner,
         |  CASE WHEN n >= 6 THEN 'high' ELSE 'medium' END AS severity,
         |  day AS violation_day
         |FROM daily WHERE n >= 3 ORDER BY id""".stripMargin
  )
}
