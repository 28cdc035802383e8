package graft.packs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{RuleEngine, ViolationRule}
import graft.sources.{AwsCollectViews, CloudTrail}

/** The remaining packs/cis_aws_pack.sql rules (the three already in
  * AwsPack — CIS 1.3 stale credentials, CIS 1.4 key rotation, plus the
  * no-MFA activity violation — stay there). Every rule here mirrors its
  * reference view's semantics — latest-snapshot dedup, alias left-join,
  * flatten-derived predicates — over the deterministic AwsCollect
  * views, so each has a full DuckDB hash oracle.
  *
  * Output shape is the engine's violation schema (id, query_name,
  * query_id, title, object, owner, severity, violation_day) with the
  * reference's query ids and titles; `object` is made unique per
  * violating identity (the reference dedups colliding identity hashes
  * at INSERT time — emitting DISTINCT identities is the equivalent
  * set). Scale: every view is dimension-sized (accounts, groups,
  * policies) — the alias join broadcasts; the only event-scale scan is
  * CIS 1.1's CloudTrail pass, which prunes on the time window.
  */
object CisAwsPack {
  import Tables.t

  private val Day = "2024-01-30"

  private def vioRule(
      name: String, queryId: String, title: String)(
      rows: DataFrame, obj: Column): DataFrame =
    RuleEngine.runViolationRule(rows, ViolationRule(
      name = name, queryId = queryId, title = title,
      predicate = lit(true), target = obj,
      owner = lit("devsecops"), severity = lit("Medium"),
      day = lit(Day).cast("date"))).orderBy(col("id"))

  private def aliasObj: Column =
    coalesce(col("account_alias"), col("account_id"))

  /** cis_aws_pack.sql:1-48 CIS 1.1 — root account used in the last 30
    * days (one violation per distinct root identity per account). */
  private def rootAccountUse(s: SparkSession, dir: String): DataFrame = {
    val ctv = CloudTrail.sharedFromEvents(s, dir)
    val roots = ctv
      .filter(col("user_identity_type") === "Root" &&
        col("source_ip_address") =!= "support.amazonaws.com" &&
        col("event_time") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
        col("event_time") < lit("2024-02-01 00:00:00").cast("timestamp"))
      .select(
        coalesce(col("user_identity_username"), col("user_identity_arn"))
          .as("actor_id"),
        col("recipient_account_id").as("account_id"))
      .distinct()
      .join(AwsCollectViews.Shared.aliasDim(s, dir),
        Seq("account_id"), "left")
    vioRule("cis_aws_1_1", "QBYAC8Z2RBF",
      "AWS CIS 1.1: Avoid the use of the \"root\" account")(
      roots,
      concat_ws("", col("actor_id"), lit(" in account "), aliasObj))
  }

  /** cis_aws_pack.sql:155-467 CIS 1.5-1.11 — the password-policy rule
    * family: one flag predicate each over the per-account policy row,
    * alias-joined for the object. */
  private def pwRule(
      name: String, queryId: String, title: String, pred: Column)(
      s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.Shared.passwordPolicy(s, dir).filter(pred)
      .join(AwsCollectViews.Shared.aliasDim(s, dir), Seq("account_id"), "left")
    vioRule(name, queryId, title)(rows, aliasObj)
  }

  /** cis_aws_pack.sql:470-540 CIS 1.12 — root access key exists:
    * latest credential report per account, root row with an active
    * key. */
  private def rootAccessKey(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews
      .latestBy(AwsCollectViews.Shared.credentialReport(s, dir), "account_id")
      .filter(col("user_name") === "<root_account>" &&
        (col("access_key_1_active") || col("access_key_2_active")))
    vioRule("cis_aws_1_12", "YO2KZE2JCG9",
      "AWS CIS 1.12: Ensure no root account access key exists")(
      rows, concat_ws("", lit("root user at account "), col("account_id")))
  }

  /** cis_aws_pack.sql:543-605 CIS 1.13 — root MFA off: latest account
    * summary with account_mfa_enabled <> 1 (or unreported). */
  private def rootMfa(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews
      .latestBy(AwsCollectViews.Shared.accountSummary(s, dir), "account_id")
      .filter(col("account_mfa_enabled").isNull ||
        col("account_mfa_enabled") =!= 1)
      .join(AwsCollectViews.Shared.aliasDim(s, dir), Seq("account_id"), "left")
    vioRule("cis_aws_1_13", "NLDRNE9GIQB",
      "AWS CIS 1.13: Ensure MFA is enabled for the \"root\" account")(
      rows, aliasObj)
  }

  /** cis_aws_pack.sql:608-671 CIS 1.14 — hardware root MFA: the
    * reference CROSS JOINs the root-serial device list against every
    * latest account summary (the devices CTE is account-unscoped —
    * reproduced verbatim), flagging accounts without MFA or whose MFA
    * is satisfied by a VIRTUAL root device. */
  private def rootHardwareMfa(s: SparkSession, dir: String): DataFrame = {
    val devices = AwsCollectViews.Shared.virtualMfaDevices(s, dir)
      .filter(col("serial_number").like("%root%"))
      .select(col("serial_number"))
    val rows = AwsCollectViews
      .latestBy(AwsCollectViews.Shared.accountSummary(s, dir), "account_id")
      .crossJoin(broadcast(devices))
      .filter(col("account_mfa_enabled").isNull ||
        col("account_mfa_enabled") =!= 1 ||
        (col("account_mfa_enabled") === 1 &&
          col("serial_number").like("%root%")))
      .select(col("account_id")).distinct()
      .join(AwsCollectViews.Shared.aliasDim(s, dir), Seq("account_id"), "left")
    vioRule("cis_aws_1_14", "ZDIAEIEAMP",
      "AWS CIS 1.14: Ensure hardware MFA is enabled for the \"root\" account")(
      rows, aliasObj)
  }

  /** cis_aws_pack.sql:674-722 CIS 1.16 — policies attached directly to
    * users (one violation per distinct account/policy — the
    * reference's identity hash). */
  private def policyOnUser(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.Shared.entitiesForPolicy(s, dir)
      .filter(col("user_id").isNotNull || col("user_name").isNotNull)
      .select(col("account_id"), col("policy_arn")).distinct()
      .join(AwsCollectViews.Shared.aliasDim(s, dir), Seq("account_id"), "left")
    vioRule("cis_aws_1_16", "ASKJ865AQ9",
      "AWS CIS 1.16: Ensure IAM policies are attached only to groups or roles")(
      rows, concat_ws("", col("policy_arn"), lit(" at "), aliasObj))
  }

  /** cis_aws_pack.sql:725-789 CIS 1.20 — AWSSupportAccess policy with
    * no attached entity at the latest snapshot. */
  private def supportRole(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.latestBy(
        AwsCollectViews.Shared.entitiesForPolicy(s, dir)
          .filter(col("policy_arn") ===
            "arn:aws:iam::aws:policy/AWSSupportAccess"),
        "account_id", "policy_arn")
      .filter(col("group_name").isNull && col("user_name").isNull &&
        col("role_name").isNull)
      .select(col("account_id")).distinct()
      .join(AwsCollectViews.Shared.aliasDim(s, dir), Seq("account_id"), "left")
    vioRule("cis_aws_1_20", "ZIXF9ISIDDB",
      "AWS CIS 1.20: Ensure a support role has been created to manage incidents with AWS Support")(
      rows, aliasObj)
  }

  /** cis_aws_pack.sql:792-870 CIS 1.22 — full "*:*" admin policies at
    * the latest policy version (per-statement rows stand in for the
    * reference's LATERAL FLATTEN of document:Statement). */
  private def fullAdminPolicy(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.latestBy(
        AwsCollectViews.Shared.policyVersions(s, dir),
        "account_id", "policy_arn")
      .filter(col("effect") === "Allow" &&
        (col("action").like("%\"*\"%") || col("action") === "*") &&
        (col("resource").like("%\"*\"%") || col("resource") === "*") &&
        col("policy_arn") =!= "arn:aws:iam::aws:policy/AdministratorAccess")
      .select(col("policy_arn")).distinct()
    vioRule("cis_aws_1_22", "1PZWDBTHHVS",
      "AWS CIS 1.22: Ensure IAM policies that allow full \"*:*\" administrative privileges are not created")(
      rows, col("policy_arn"))
  }

  /** cis_aws_pack.sql:873-940 CIS 2.2 — trails without log-file
    * validation at the latest describe-trails snapshot. */
  private def trailValidation(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.latestBy(
        AwsCollectViews.Shared.describeTrails(s, dir),
        "account_id", "name")
      .filter(col("log_file_validation_enabled") === "FALSE")
    vioRule("cis_aws_2_2", "G8HQTE899ZL",
      "AWS CIS 2.2: Ensure CloudTrail log file validation is enabled")(
      rows, col("name"))
  }

  /** cis_aws_pack.sql:943-1052 CIS 2.3 — CloudTrail buckets whose
    * policy has a public Allow block (the reference's LIKE/RLIKE
    * pattern stack over flattened Statement blocks, verbatim). */
  private def trailBucketPublic(s: SparkSession, dir: String): DataFrame = {
    val trailBuckets = AwsCollectViews
      .latestBy(AwsCollectViews.Shared.describeTrails(s, dir), "account_id", "name")
      .select(col("account_id").as("tb_account_id"),
        col("s3_bucket_name")).distinct()
    val condExempt =
      "\"Condition\":\\s*\\{\\s*\"ArnEquals\":\\s*\\{\\s*\"aws:SourceArn\":\\s*\"arn:aws:iam"
    val rows = AwsCollectViews.Shared.bucketPolicies(s, dir)
      .join(trailBuckets,
        col("tb_account_id") === col("account_id") &&
          col("s3_bucket_name") === col("bucket"))
      .filter(
        col("policy_block").like("%\"Effect\":\"Allow\"%") &&
          (col("policy_block").like("%\"Principal\":\"*\"%") ||
            col("policy_block").like("%\"Principal\":{\"AWS\":\"*\"}%")) &&
          !col("policy_block").rlike(condExempt) &&
          !(col("policy").like("%\"Effect\":%\"Deny\"%") &&
            col("policy").like("%\"StringNotEquals\"%")) &&
          !(col("policy").like("%\"Effect\":%\"Deny\"%") &&
            col("policy").like("%\"NotPrincipal\"%")))
      .select(col("bucket")).distinct()
    vioRule("cis_aws_2_3", "0XADVOX2M5CQ",
      "AWS CIS 2.3: Ensure the S3 bucket used to store CloudTrail logs is not publicly accessible")(
      rows, col("bucket"))
  }

  /** cis_aws_pack.sql:1055-1100 CIS 2.5 — accounts with no
    * fully-scoped Config recorder (anti-join of the alias dimension
    * against compliant recorder accounts). */
  private def configEnabled(s: SparkSession, dir: String): DataFrame = {
    val good = AwsCollectViews.Shared.configRecorders(s, dir)
      .filter(col("all_supported") && col("include_global"))
      .select(col("account_id"))
    val rows = AwsCollectViews.Shared.aliasDim(s, dir)
      .join(good, Seq("account_id"), "left_anti")
    vioRule("cis_aws_2_5", "PWXDLM6H16",
      "AWS CIS 2.5: Ensure AWS Config is enabled in all regions")(
      rows, col("account_alias"))
  }

  /** cis_aws_pack.sql:1103-1292 CIS 4.1/4.2 — security groups open to
    * the world on a given port at the latest snapshot (per-permission
    * rows stand in for the ip_permissions flatten). */
  private def sgOpenPort(
      name: String, queryId: String, title: String, port: Int,
      protPred: Column)(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.latestBy(
        AwsCollectViews.Shared.securityGroups(s, dir),
        "group_id")
      .filter(protPred &&
        ((col("range_start").isNull && col("range_end").isNull) ||
          (col("range_start") <= port && col("range_end") >= port)) &&
        (col("source_ips_v4").like("%0.0.0.0%") ||
          col("source_ips_v6").like("::/0")))
      .select(col("group_id")).distinct()
    vioRule(name, queryId, title)(rows, col("group_id"))
  }

  /** cis_aws_pack.sql:1295-1370 CIS 4.3 — default security groups with
    * any non-`-1`-protocol permission. */
  private def defaultSgOpen(s: SparkSession, dir: String): DataFrame = {
    val rows = AwsCollectViews.latestBy(
        AwsCollectViews.Shared.securityGroups(s, dir),
        "group_id")
      .filter(col("group_name") === "default" && col("prot") =!= "-1")
      .select(col("group_id")).distinct()
    vioRule("cis_aws_4_3", "P7QZMWJ6Z0O",
      "AWS CIS 4.3: Ensure the default security group of every VPC restricts all traffic")(
      rows, col("group_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_cis_1_1_root_account" -> (rootAccountUse _),
    "q_pack_cis_1_5_pw_uppercase" -> pwRule(
      "cis_aws_1_5", "F85S78KK42",
      "AWS CIS 1.5: Ensure IAM password policy requires at least one uppercase letter",
      !coalesce(col("require_uppercase_characters"), lit(false))) _,
    "q_pack_cis_1_6_pw_lowercase" -> pwRule(
      "cis_aws_1_6", "NUNJCFNQ13",
      "AWS CIS 1.6: Ensure IAM password policy require at least one lowercase letter",
      !coalesce(col("require_lowercase_characters"), lit(false))) _,
    "q_pack_cis_1_7_pw_symbols" -> pwRule(
      "cis_aws_1_7", "ASQCIZO9VC",
      "AWS CIS 1.7: Ensure IAM password policy require at least one symbol",
      !coalesce(col("require_symbols"), lit(false))) _,
    "q_pack_cis_1_8_pw_numbers" -> pwRule(
      "cis_aws_1_8", "SKNR99XCFYS",
      "AWS CIS 1.8: Ensure IAM password policy require at least one number",
      !coalesce(col("require_numbers"), lit(false))) _,
    "q_pack_cis_1_9_pw_length" -> pwRule(
      "cis_aws_1_9", "NDHSGN5MT9L",
      "AWS CIS 1.9: Ensure IAM password policy requires minimum length of 14 or greater",
      col("minimum_password_length").isNull ||
        col("minimum_password_length") < 14) _,
    "q_pack_cis_1_10_pw_reuse" -> pwRule(
      "cis_aws_1_10", "A80WZDM7JP",
      "AWS CIS 1.10: Ensure IAM password policy prevents password reuse",
      col("password_reuse_prevention").isNull ||
        col("password_reuse_prevention") < 24) _,
    "q_pack_cis_1_11_pw_expiry" -> pwRule(
      "cis_aws_1_11", "SAVBJIUB6OH",
      "AWS CIS 1.11: Ensure IAM password policy expires passwords within 90 days or less",
      !coalesce(col("expire_passwords"), lit(false)) ||
        col("max_password_age").isNull ||
        col("max_password_age") > 90) _,
    "q_pack_cis_1_12_root_key" -> (rootAccessKey _),
    "q_pack_cis_1_13_root_mfa" -> (rootMfa _),
    "q_pack_cis_1_14_root_hw_mfa" -> (rootHardwareMfa _),
    "q_pack_cis_1_16_policy_on_user" -> (policyOnUser _),
    "q_pack_cis_1_20_support_role" -> (supportRole _),
    "q_pack_cis_1_22_full_admin" -> (fullAdminPolicy _),
    "q_pack_cis_2_2_trail_validation" -> (trailValidation _),
    "q_pack_cis_2_3_trail_bucket_public" -> (trailBucketPublic _),
    "q_pack_cis_2_5_config_enabled" -> (configEnabled _),
    "q_pack_cis_4_1_sg_ssh_open" -> sgOpenPort(
      "cis_aws_4_1", "JW0HBLN2EW",
      "AWS CIS 4.1: Ensure no security groups allow ingress from 0.0.0.0/0 to port 22",
      22, col("prot") === "tcp") _,
    "q_pack_cis_4_2_sg_rdp_open" -> sgOpenPort(
      "cis_aws_4_2", "M6Y4F1UEW3P",
      "AWS CIS 4.2: Ensure no security groups allow ingress from 0.0.0.0/0 to port 3389",
      3389, col("prot").isin("tcp", "udp")) _,
    "q_pack_cis_4_3_default_sg" -> (defaultSgOpen _)
  )

  /** Violation-row oracle template (same shape as runViolationRule). */
  private def vioSql(
      name: String, queryId: String, title: String, obj: String,
      from: String): String =
    s"""SELECT
       |  md5('$name|' || $obj || '|$title|$Day') AS id,
       |  '$name' AS query_name, '$queryId' AS query_id,
       |  '$title' AS title,
       |  $obj AS object, 'devsecops' AS owner,
       |  'Medium' AS severity, DATE '$Day' AS violation_day
       |FROM $from
       |ORDER BY id""".stripMargin

  private val AliasObjSql = "COALESCE(account_alias, account_id)"

  private def pwSql(
      name: String, queryId: String, title: String,
      where: String): String =
    s"""${AwsCollectViews.CollectCtes}, hits AS (
       |  SELECT p.account_id, a.account_alias
       |  FROM pwpolicy p LEFT JOIN alias_dim a USING (account_id)
       |  WHERE $where
       |)
       |${vioSql(name, queryId, title, AliasObjSql, "hits")}""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_pack_cis_1_1_root_account" ->
      s"""${CloudTrail.FromEventsCte}, alias_dim AS (
         |  SELECT DISTINCT account_id, account_alias FROM (
         |    SELECT CAST(100000000000 + n_nationkey AS VARCHAR)
         |        AS account_id,
         |      lower(n_name) AS account_alias
         |    FROM nation
         |    UNION ALL SELECT '111122223333', 'prod-main'
         |  )
         |), roots AS (
         |  SELECT DISTINCT
         |    COALESCE(user_identity_username, user_identity_arn)
         |      AS actor_id,
         |    recipient_account_id AS account_id
         |  FROM ct
         |  WHERE user_identity_type = 'Root'
         |    AND source_ip_address <> 'support.amazonaws.com'
         |    AND event_time >= TIMESTAMP '2024-01-01'
         |    AND event_time < TIMESTAMP '2024-02-01'
         |), hits AS (
         |  SELECT r.actor_id || ' in account ' || $AliasObjSql AS obj
         |  FROM roots r LEFT JOIN alias_dim a USING (account_id)
         |)
         |${vioSql("cis_aws_1_1", "QBYAC8Z2RBF",
           "AWS CIS 1.1: Avoid the use of the \"root\" account",
           "obj", "hits")}""".stripMargin,

    "q_pack_cis_1_5_pw_uppercase" -> pwSql(
      "cis_aws_1_5", "F85S78KK42",
      "AWS CIS 1.5: Ensure IAM password policy requires at least one uppercase letter",
      "NOT COALESCE(require_uppercase_characters, false)"),
    "q_pack_cis_1_6_pw_lowercase" -> pwSql(
      "cis_aws_1_6", "NUNJCFNQ13",
      "AWS CIS 1.6: Ensure IAM password policy require at least one lowercase letter",
      "NOT COALESCE(require_lowercase_characters, false)"),
    "q_pack_cis_1_7_pw_symbols" -> pwSql(
      "cis_aws_1_7", "ASQCIZO9VC",
      "AWS CIS 1.7: Ensure IAM password policy require at least one symbol",
      "NOT COALESCE(require_symbols, false)"),
    "q_pack_cis_1_8_pw_numbers" -> pwSql(
      "cis_aws_1_8", "SKNR99XCFYS",
      "AWS CIS 1.8: Ensure IAM password policy require at least one number",
      "NOT COALESCE(require_numbers, false)"),
    "q_pack_cis_1_9_pw_length" -> pwSql(
      "cis_aws_1_9", "NDHSGN5MT9L",
      "AWS CIS 1.9: Ensure IAM password policy requires minimum length of 14 or greater",
      "minimum_password_length IS NULL OR minimum_password_length < 14"),
    "q_pack_cis_1_10_pw_reuse" -> pwSql(
      "cis_aws_1_10", "A80WZDM7JP",
      "AWS CIS 1.10: Ensure IAM password policy prevents password reuse",
      "password_reuse_prevention IS NULL OR password_reuse_prevention < 24"),
    "q_pack_cis_1_11_pw_expiry" -> pwSql(
      "cis_aws_1_11", "SAVBJIUB6OH",
      "AWS CIS 1.11: Ensure IAM password policy expires passwords within 90 days or less",
      """NOT COALESCE(expire_passwords, false)
        |    OR max_password_age IS NULL OR max_password_age > 90"""
        .stripMargin),

    "q_pack_cis_1_12_root_key" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM credrep
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT 'root user at account ' || account_id AS obj
         |  FROM latest
         |  WHERE user_name = '<root_account>'
         |    AND (access_key_1_active OR access_key_2_active)
         |)
         |${vioSql("cis_aws_1_12", "YO2KZE2JCG9",
           "AWS CIS 1.12: Ensure no root account access key exists",
           "obj", "hits")}""".stripMargin,

    "q_pack_cis_1_13_root_mfa" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM acctsum
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT l.account_id, a.account_alias
         |  FROM latest l LEFT JOIN alias_dim a USING (account_id)
         |  WHERE account_mfa_enabled IS NULL OR account_mfa_enabled <> 1
         |)
         |${vioSql("cis_aws_1_13", "NLDRNE9GIQB",
           "AWS CIS 1.13: Ensure MFA is enabled for the \"root\" account",
           AliasObjSql, "hits")}""".stripMargin,

    "q_pack_cis_1_14_root_hw_mfa" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM acctsum
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id ORDER BY recorded_at DESC)
         |), devices AS (
         |  SELECT serial_number FROM mfadevices
         |  WHERE serial_number LIKE '%root%'
         |), hits AS (
         |  SELECT v.account_id, a.account_alias
         |  FROM (
         |    SELECT DISTINCT l.account_id
         |    FROM latest l, devices d
         |    WHERE account_mfa_enabled IS NULL
         |       OR account_mfa_enabled <> 1
         |       OR (account_mfa_enabled = 1
         |           AND d.serial_number LIKE '%root%')
         |  ) v LEFT JOIN alias_dim a USING (account_id)
         |)
         |${vioSql("cis_aws_1_14", "ZDIAEIEAMP",
           "AWS CIS 1.14: Ensure hardware MFA is enabled for the \"root\" account",
           AliasObjSql, "hits")}""".stripMargin,

    "q_pack_cis_1_16_policy_on_user" ->
      s"""${AwsCollectViews.CollectCtes}, hits AS (
         |  SELECT v.policy_arn, a.account_alias, v.account_id
         |  FROM (
         |    SELECT DISTINCT account_id, policy_arn FROM entities
         |    WHERE user_id IS NOT NULL OR user_name IS NOT NULL
         |  ) v LEFT JOIN alias_dim a USING (account_id)
         |)
         |${vioSql("cis_aws_1_16", "ASKJ865AQ9",
           "AWS CIS 1.16: Ensure IAM policies are attached only to groups or roles",
           s"policy_arn || ' at ' || $AliasObjSql", "hits")}""".stripMargin,

    "q_pack_cis_1_20_support_role" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM entities
         |  WHERE policy_arn = 'arn:aws:iam::aws:policy/AWSSupportAccess'
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id, policy_arn ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT v.account_id, a.account_alias
         |  FROM (
         |    SELECT DISTINCT account_id FROM latest
         |    WHERE group_name IS NULL AND user_name IS NULL
         |      AND role_name IS NULL
         |  ) v LEFT JOIN alias_dim a USING (account_id)
         |)
         |${vioSql("cis_aws_1_20", "ZIXF9ISIDDB",
           "AWS CIS 1.20: Ensure a support role has been created to manage incidents with AWS Support",
           AliasObjSql, "hits")}""".stripMargin,

    "q_pack_cis_1_22_full_admin" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM polver
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id, policy_arn ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT DISTINCT policy_arn FROM latest
         |  WHERE effect = 'Allow'
         |    AND (action LIKE '%"*"%' OR action = '*')
         |    AND (resource LIKE '%"*"%' OR resource = '*')
         |    AND policy_arn <> 'arn:aws:iam::aws:policy/AdministratorAccess'
         |)
         |${vioSql("cis_aws_1_22", "1PZWDBTHHVS",
           "AWS CIS 1.22: Ensure IAM policies that allow full \"*:*\" administrative privileges are not created",
           "policy_arn", "hits")}""".stripMargin,

    "q_pack_cis_2_2_trail_validation" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM trails
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id, name ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT name FROM latest
         |  WHERE log_file_validation_enabled = 'FALSE'
         |)
         |${vioSql("cis_aws_2_2", "G8HQTE899ZL",
           "AWS CIS 2.2: Ensure CloudTrail log file validation is enabled",
           "name", "hits")}""".stripMargin,

    "q_pack_cis_2_3_trail_bucket_public" ->
      s"""${AwsCollectViews.CollectCtes}, trail_buckets AS (
         |  SELECT DISTINCT account_id, s3_bucket_name FROM trails
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY account_id, name ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT DISTINCT b.bucket
         |  FROM bucketpol b
         |  JOIN trail_buckets tb
         |    ON tb.account_id = b.account_id
         |   AND tb.s3_bucket_name = b.bucket
         |  WHERE b.policy_block LIKE '%"Effect":"Allow"%'
         |    AND (b.policy_block LIKE '%"Principal":"*"%'
         |         OR b.policy_block LIKE '%"Principal":{"AWS":"*"}%')
         |    AND NOT regexp_matches(b.policy_block,
         |      '"Condition":\\s*\\{\\s*"ArnEquals":\\s*\\{\\s*"aws:SourceArn":\\s*"arn:aws:iam')
         |    AND NOT (b.policy LIKE '%"Effect":%"Deny"%'
         |             AND b.policy LIKE '%"StringNotEquals"%')
         |    AND NOT (b.policy LIKE '%"Effect":%"Deny"%'
         |             AND b.policy LIKE '%"NotPrincipal"%')
         |)
         |${vioSql("cis_aws_2_3", "0XADVOX2M5CQ",
           "AWS CIS 2.3: Ensure the S3 bucket used to store CloudTrail logs is not publicly accessible",
           "bucket", "hits")}""".stripMargin,

    "q_pack_cis_2_5_config_enabled" ->
      s"""${AwsCollectViews.CollectCtes}, hits AS (
         |  SELECT account_alias FROM alias_dim
         |  WHERE account_id NOT IN (
         |    SELECT account_id FROM configrec
         |    WHERE all_supported AND include_global
         |  )
         |)
         |${vioSql("cis_aws_2_5", "PWXDLM6H16",
           "AWS CIS 2.5: Ensure AWS Config is enabled in all regions",
           "account_alias", "hits")}""".stripMargin,

    "q_pack_cis_4_1_sg_ssh_open" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM sgperms
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY group_id ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT DISTINCT group_id FROM latest
         |  WHERE prot = 'tcp'
         |    AND ((range_start IS NULL AND range_end IS NULL)
         |         OR (range_start <= 22 AND range_end >= 22))
         |    AND (source_ips_v4 LIKE '%0.0.0.0%'
         |         OR source_ips_v6 LIKE '::/0')
         |)
         |${vioSql("cis_aws_4_1", "JW0HBLN2EW",
           "AWS CIS 4.1: Ensure no security groups allow ingress from 0.0.0.0/0 to port 22",
           "group_id", "hits")}""".stripMargin,

    "q_pack_cis_4_2_sg_rdp_open" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM sgperms
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY group_id ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT DISTINCT group_id FROM latest
         |  WHERE prot IN ('tcp', 'udp')
         |    AND ((range_start IS NULL AND range_end IS NULL)
         |         OR (range_start <= 3389 AND range_end >= 3389))
         |    AND (source_ips_v4 LIKE '%0.0.0.0%'
         |         OR source_ips_v6 LIKE '::/0')
         |)
         |${vioSql("cis_aws_4_2", "M6Y4F1UEW3P",
           "AWS CIS 4.2: Ensure no security groups allow ingress from 0.0.0.0/0 to port 3389",
           "group_id", "hits")}""".stripMargin,

    "q_pack_cis_4_3_default_sg" ->
      s"""${AwsCollectViews.CollectCtes}, latest AS (
         |  SELECT * FROM sgperms
         |  QUALIFY 1 = RANK() OVER (
         |    PARTITION BY group_id ORDER BY recorded_at DESC)
         |), hits AS (
         |  SELECT DISTINCT group_id FROM latest
         |  WHERE group_name = 'default' AND prot <> '-1'
         |)
         |${vioSql("cis_aws_4_3", "P7QZMWJ6Z0O",
           "AWS CIS 4.3: Ensure the default security group of every VPC restricts all traffic",
           "group_id", "hits")}""".stripMargin
  )
}
