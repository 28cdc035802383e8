package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic `aws_collect_*` snapshot views for the CIS AWS pack
  * (reference: src/connectors/aws_collect.py landing tables,
  * packs/cis_aws_pack.sql rule inputs). Each view is derived
  * deterministically from the TPC-H-ish test tables (`nation` =
  * account universe, `customer` = IAM entities, `supplier` = security
  * groups) and carries TWO `recorded_at` snapshots where the reference
  * rule dedups to the latest one — the older snapshot holds
  * all-violating values, so a rule that forgets the latest-snapshot
  * step produces a different (wrong) answer and fails its oracle.
  *
  * Every view has a DuckDB CTE twin in [[CollectCtes]]; the pack rules
  * in graft.packs.CisAwsPack consume both sides.
  *
  * Column sets follow aws_collect.py's LANDING_TABLES_COLUMNS
  * (aws_collect.py:105-300); VARIANT array columns the reference
  * flattens with LATERAL FLATTEN (credential-report rows, policy
  * statements, security-group ip_permissions) are landed one row per
  * element — the post-flatten shape — so rule semantics are identical
  * while both engines stay in plain relational operators.
  */
object AwsCollectViews {

  /** Snapshot instants: D1 (stale, all-violating values) and D2
    * (latest, the graded truth). */
  val D1 = "2024-01-29 00:00:00"
  val D2 = "2024-01-30 00:00:00"

  private def acct(k: Column): Column =
    (lit(100000000000L) + k).cast("string")

  /** Two-snapshot frame: cross joins the source with both instants so
    * snapshot-dependent values can branch on `recorded_at`. */
  private def withSnapshots(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.crossJoin(
      Seq(D1, D2).toDF("__snap")
        .select(col("__snap").cast("timestamp").as("recorded_at")))
  }

  private def isLatest: Column =
    col("recorded_at") === lit(D2).cast("timestamp")

  /** Keep only each key's most recent snapshot — rank (not row_number)
    * so multi-row groups (per-statement / per-permission landings)
    * keep ALL rows at the latest instant. One shuffle on the key; the
    * same shape as the reference's max(recorded_at) self-join but
    * single-pass. */
  def latestBy(df: DataFrame, keys: String*): DataFrame =
    df.withColumn("__rk",
        rank().over(Window.partitionBy(keys.map(col): _*)
          .orderBy(col("recorded_at").desc)))
      .filter(col("__rk") === 1).drop("__rk")

  /** iam_list_account_aliases (aws_collect.py:105-110): account →
    * alias, both snapshots agree, plus the CloudTrail-view account so
    * the CIS 1.1 alias join resolves. */
  def aliases(s: SparkSession, nation: DataFrame): DataFrame = {
    import s.implicits._
    withSnapshots(s, nation)
      .select(acct(col("n_nationkey")).as("account_id"),
        lower(col("n_name")).as("account_alias"), col("recorded_at"))
      .unionByName(
        Seq(("111122223333", "prod-main", D2)).toDF(
          "account_id", "account_alias", "__snap")
          .select(col("account_id"), col("account_alias"),
            col("__snap").cast("timestamp").as("recorded_at")))
  }

  /** The `SELECT DISTINCT account_id, account_alias` dimension every
    * rule left-joins (cis_aws_pack.sql's repeated subquery). Small →
    * always broadcast. */
  def aliasDim(s: SparkSession, nation: DataFrame): DataFrame =
    broadcast(aliases(s, nation)
      .select(col("account_id"), col("account_alias")).distinct())

  /** iam_get_account_password_policy (aws_collect.py:151-165): one
    * policy row per account, single snapshot (the reference's password
    * rules read DISTINCT flags with no time dedup). */
  def passwordPolicy(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(
      acct(k).as("account_id"),
      when(k % 4 === 0, lit(false)).when(k % 4 === 1, lit(null))
        .otherwise(lit(true)).as("require_uppercase_characters"),
      when(k % 4 === 2, lit(false)).when(k % 4 === 3, lit(null))
        .otherwise(lit(true)).as("require_lowercase_characters"),
      when(k % 3 === 0, lit(false)).otherwise(lit(true))
        .as("require_symbols"),
      when(k % 5 === 0, lit(false)).when(k % 5 === 1, lit(null))
        .otherwise(lit(true)).as("require_numbers"),
      when(k % 6 === 0, lit(null))
        .otherwise(lit(8) + (k * 3) % 10).as("minimum_password_length"),
      when(k % 4 === 0, lit(null))
        .otherwise((k * 7) % 30).as("password_reuse_prevention"),
      when(k % 3 === 0, lit(false)).otherwise(lit(true))
        .as("expire_passwords"),
      when(k % 5 === 0, lit(null))
        .otherwise(lit(30) + (k * 11) % 120).as("max_password_age"))
  }

  /** iam_get_credential_report (aws_collect.py:218-226) landed
    * one row per report entry (the reference flattens
    * content_csv_parsed): root + two IAM users per account, two
    * snapshots — in the stale one every root key is active. */
  def credentialReport(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation)
      .select(acct(k).as("account_id"), col("recorded_at"), k.as("__k"),
        explode(array(lit("<root_account>"), lit("alice"), lit("bob")))
          .as("user_name"))
      .select(col("account_id"), col("recorded_at"), col("user_name"),
        concat_ws("", lit("arn:aws:iam::"), col("account_id"),
          lit(":"), col("user_name")).as("arn"),
        when(isLatest,
          when(col("user_name") === "<root_account>", col("__k") % 4 === 0)
            .when(col("user_name") === "alice", col("__k") % 2 === 0)
            .otherwise(lit(false)))
          .otherwise(lit(true)).as("access_key_1_active"),
        when(isLatest,
          col("user_name") === "<root_account>" && col("__k") % 8 === 0)
          .otherwise(col("__k") % 2 === 1).as("access_key_2_active"))
  }

  /** iam_get_account_summary (aws_collect.py:112-150, the
    * account_mfa_enabled column): stale snapshot all-zero. */
  def accountSummary(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation).select(
      acct(k).as("account_id"), col("recorded_at"),
      when(isLatest,
        when(k % 6 === 0, lit(0)).when(k % 6 === 1, lit(null))
          .otherwise(lit(1)))
        .otherwise(lit(0)).as("account_mfa_enabled"))
  }

  /** iam_list_virtual_mfa_devices (aws_collect.py:412-420): even
    * accounts carry a VIRTUAL root MFA device (serial contains
    * 'root'), odd accounts a user device. */
  def virtualMfaDevices(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(acct(k).as("account_id"),
      concat_ws("", lit("arn:aws:iam::"), acct(k), lit(":mfa/"),
        when(k % 2 === 0, lit("root-account-mfa-device"))
          .otherwise(lit("user-device"))).as("serial_number"))
  }

  /** iam_list_entities_for_policy (aws_collect.py:399-410): customer
    * rows are managed-policy attachments (user/group/role round-robin,
    * snapshot D2); nation rows are each account's AWSSupportAccess
    * entry — attached to a support role in the STALE snapshot for all
    * accounts but only for k%3==0 in the latest one. */
  def entitiesForPolicy(
      s: SparkSession, customer: DataFrame, nation: DataFrame): DataFrame = {
    val c = col("c_custkey")
    val attachments = customer.select(
      acct(c % 25).as("account_id"),
      lit(D2).cast("timestamp").as("recorded_at"),
      concat_ws("", lit("arn:aws:iam::aws:policy/p"), c % 7)
        .as("policy_arn"),
      when(c % 3 === 0, concat_ws("", lit("AIDA"), c)).as("user_id"),
      when(c % 3 === 0, concat_ws("", lit("u"), c % 50)).as("user_name"),
      when(c % 3 === 1, concat_ws("", lit("g"), c % 10)).as("group_name"),
      when(c % 3 === 2, concat_ws("", lit("r"), c % 10)).as("role_name"))
    val k = col("n_nationkey")
    val support = withSnapshots(s, nation).select(
      acct(k).as("account_id"), col("recorded_at"),
      lit("arn:aws:iam::aws:policy/AWSSupportAccess").as("policy_arn"),
      lit(null).cast("string").as("user_id"),
      lit(null).cast("string").as("user_name"),
      lit(null).cast("string").as("group_name"),
      when(!isLatest || k % 3 === 0, lit("support")).as("role_name"))
    attachments.unionByName(support)
  }

  /** iam_get_policy_version (aws_collect.py:388-397) landed one row
    * per policy-document statement; the stale snapshot is all
    * `Allow * on *`. */
  def policyVersions(s: SparkSession, customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    withSnapshots(s, customer).select(
      acct(c % 25).as("account_id"), col("recorded_at"),
      concat_ws("", lit("arn:aws:iam::"), acct(c % 25), lit(":policy/cp"),
        c % 9).as("policy_arn"),
      when(isLatest,
        when(c % 5 === 1, lit("Deny")).otherwise(lit("Allow")))
        .otherwise(lit("Allow")).as("effect"),
      when(isLatest,
        when(c % 4 === 0, lit("*")).when(c % 4 === 1, lit("[\"*\"]"))
          .otherwise(lit("s3:GetObject")))
        .otherwise(lit("*")).as("action"),
      when(isLatest,
        when(c % 3 === 0, lit("*"))
          .otherwise(concat_ws("", lit("arn:aws:s3:::b"), c % 20)))
        .otherwise(lit("*")).as("resource"))
  }

  /** cloudtrail_describe_trails (aws_collect.py:463-480): two trails
    * per account, two snapshots — the stale one has validation off
    * everywhere. */
  def describeTrails(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation)
      .select(acct(k).as("account_id"), col("recorded_at"), k.as("__k"),
        explode(array(lit(0), lit(1))).as("__t"))
      .select(col("account_id"), col("recorded_at"),
        concat_ws("-", lit("trail"), col("__k"), col("__t")).as("name"),
        concat_ws("-", lit("ct-logs"), col("__k"), col("__t"))
          .as("s3_bucket_name"),
        when(isLatest,
          when((col("__k") + col("__t")) % 3 === 0, lit("FALSE"))
            .otherwise(lit("TRUE")))
          .otherwise(lit("FALSE")).as("log_file_validation_enabled"))
  }

  /** s3_get_bucket_policy (aws_collect.py:444-452) landed one row per
    * policy Statement block (strings built without whitespace so the
    * reference's LIKE patterns apply verbatim). Block mix per bucket:
    * 0 = public `Principal:"*"`, 1 = public `{"AWS":"*"}`, 2 = public
    * but SourceArn-conditioned (exempt), 3 = scoped principal,
    * 4 = public + a Deny/StringNotEquals block (exempt). */
  def bucketPolicies(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    val base = nation
      .select(acct(k).as("account_id"), k.as("__k"),
        explode(array(lit(0), lit(1))).as("__t"))
      .withColumn("bucket",
        concat_ws("-", lit("ct-logs"), col("__k"), col("__t")))
      .withColumn("__bt", (col("__k") * 2 + col("__t")) % 5)
    val pubA = concat_ws("",
      lit("""{"Effect":"Allow","Principal":"*","Action":"s3:GetObject","Resource":"arn:aws:s3:::"""),
      col("bucket"), lit("""/*"}"""))
    val pubB = concat_ws("",
      lit("""{"Effect":"Allow","Principal":{"AWS":"*"},"Action":"s3:GetObject","Resource":"arn:aws:s3:::"""),
      col("bucket"), lit("""/*"}"""))
    val cond = concat_ws("",
      lit("""{"Effect":"Allow","Principal":"*","Action":"s3:GetObject","Condition":{"ArnEquals":{"aws:SourceArn":"arn:aws:iam::"""),
      col("account_id"), lit(""":role/ct"}}}"""))
    val priv = concat_ws("",
      lit("""{"Effect":"Allow","Principal":{"AWS":"arn:aws:iam::"""),
      col("account_id"), lit(""":root"},"Action":"s3:GetObject"}"""))
    val deny =
      lit("""{"Effect":"Deny","Condition":{"StringNotEquals":{"aws:SourceVpc":"vpc-1"}}}""")
    val blocks = when(col("__bt") === 0, array(pubA))
      .when(col("__bt") === 1, array(pubB))
      .when(col("__bt") === 2, array(cond))
      .when(col("__bt") === 3, array(priv))
      .otherwise(array(pubA, deny))
    base.withColumn("__blocks", blocks)
      .withColumn("policy",
        concat_ws("", lit("""{"Statement":["""),
          array_join(col("__blocks"), ","), lit("]}")))
      .select(col("account_id"), col("bucket"), col("policy"),
        explode(col("__blocks")).as("policy_block"))
  }

  /** config_describe_configuration_recorders (aws_collect.py:208-216):
    * only every third account has a recorder, and only every sixth a
    * fully-scoped one. */
  def configRecorders(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.filter(k % 3 === 0).select(
      acct(k).as("account_id"), lit("default").as("name"),
      lit(true).as("all_supported"), (k % 6 === 0).as("include_global"))
  }

  // --- remaining LANDING_TABLES endpoints (aws_collect.py:97-556) ----
  // The API shapes no cis_aws_pack rule consumes — landed
  // latest-snapshot (D2) with the full reference column lists, keyed
  // to the SAME universes the consumed views use (users u<c%50>,
  // groups g<0-9>, roles r<0-9>, managed policies p<0-6> +
  // customer-managed cp<0-8>, buckets/trails ct-logs-<k>-<t>), so the
  // inventory is a coherent join graph, not 19 islands. Closing these
  // makes aws_collect endpoint parity exact.

  private def d2: Column = lit(D2).cast("timestamp")
  private def nstr(n: String): Column = lit(null).cast("string").as(n)
  private def nts(n: String): Column = lit(null).cast("timestamp").as(n)

  /** iam_generate_credential_report (aws_collect.py:97): the trigger
    * call's landing — one COMPLETE row per account. */
  def generateCredentialReport(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(d2.as("recorded_at"), acct(k).as("account_id"),
      nstr("error"), lit("COMPLETE").as("state"),
      nstr("description"))
  }

  /** ec2_describe_instances (aws_collect.py:167): one reservation per
    * customer; the instances subtree stays VARIANT JSON. */
  def ec2Instances(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(d2.as("recorded_at"), acct(c % 25).as("account_id"),
      when(c % 2 === 0, "us-east-1").otherwise("us-west-2").as("region"),
      nstr("error"),
      lit("""[{"GroupName":"default"}]""").as("groups"),
      format_string(
        """[{"InstanceId":"i-%d","State":{"Name":"%s"}}]""",
        c, when(c % 7 === 0, "stopped").otherwise("running"))
        .as("instances"),
      acct(c % 25).as("owner_id"), nstr("requester_id"),
      concat_ws("", lit("r-"), c).as("reservation_id"))
  }

  /** ec2_describe_route_tables (aws_collect.py:179). */
  def ec2RouteTables(supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(d2.as("recorded_at"), acct(k % 25).as("account_id"),
      when(k % 2 === 0, "us-east-1").otherwise("us-west-2").as("region"),
      nstr("error"),
      lit("""[{"Main":true}]""").as("associations"),
      lit("[]").as("propagating_vgws"),
      concat_ws("", lit("rtb-"), k).as("route_table_id"),
      format_string(
        """[{"DestinationCidrBlock":"10.%d.0.0/16","GatewayId":"local"}]""",
        k % 256).as("routes"),
      nstr("tags"),
      concat_ws("", lit("vpc-"), k % 25).as("vpc_id"),
      acct(k % 25).as("owner_id"))
  }

  /** kms_list_keys (aws_collect.py:228) + kms_get_key_rotation_status
    * (:237) — rotation rows join list rows on key_arn. */
  def kmsKeys(supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(d2.as("recorded_at"), acct(k % 25).as("account_id"),
      when(k % 2 === 0, "us-east-1").otherwise("us-west-2").as("region"),
      nstr("error"),
      concat_ws("", lit("key-"), k).as("key_id"),
      concat_ws("", lit("arn:aws:kms:us-east-1:"), acct(k % 25),
        lit(":key/key-"), k).as("key_arn"))
  }

  def kmsKeyRotation(supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(d2.as("recorded_at"), acct(k % 25).as("account_id"),
      concat_ws("", lit("arn:aws:kms:us-east-1:"), acct(k % 25),
        lit(":key/key-"), k).as("key_arn"),
      nstr("error"),
      (k % 3 =!= 0).as("key_rotation_enabled"))
  }

  /** The per-user fan-out calls (aws_collect.py:259-314): login
    * profile (console users only), MFA devices, access keys, group
    * memberships, inline + attached policies — all keyed on the
    * u<c%50> user universe of [[entitiesForPolicy]]. */
  private def userRow(c: Column): Seq[Column] = Seq(
    d2.as("recorded_at"), acct(c % 25).as("account_id"),
    concat_ws("", lit("u"), c % 50).as("user_name"))

  def loginProfiles(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.filter(c % 2 === 0).select(userRow(c) ++ Seq(
      nstr("error"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("create_date"),
      (c % 9 === 0).as("password_reset_required")): _*)
  }

  def mfaDevices(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.filter(c % 4 === 0).select(userRow(c) ++ Seq(
      nstr("error"),
      concat_ws("", lit("arn:aws:iam::"), acct(c % 25), lit(":mfa/u"),
        c % 50).as("serial_number"),
      lit("2023-06-02 00:00:00").cast("timestamp").as("enable_date")): _*)
  }

  def accessKeys(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(userRow(c) ++ Seq(
      nstr("error"),
      concat_ws("", lit("AKIA"), c).as("access_key_id"),
      when(c % 5 === 0, "Inactive").otherwise("Active").as("status"),
      lit("2023-06-03 00:00:00").cast("timestamp").as("create_date")): _*)
  }

  def groupsForUser(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(userRow(c) ++ Seq(
      nstr("error"), lit("/").as("path"),
      concat_ws("", lit("g"), c % 10).as("group_name"),
      concat_ws("", lit("AGPA"), c % 10).as("group_id"),
      concat_ws("", lit("arn:aws:iam::"), acct(c % 25), lit(":group/g"),
        c % 10).as("arn"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("create_date")): _*)
  }

  def userPolicies(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.filter(c % 3 === 0).select(userRow(c) ++ Seq(
      nstr("error"),
      concat_ws("", lit("inline-u"), c % 50).as("policy_name")): _*)
  }

  def attachedUserPolicies(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(userRow(c) ++ Seq(
      nstr("error"),
      concat_ws("", lit("p"), c % 7).as("policy_name"),
      concat_ws("", lit("arn:aws:iam::aws:policy/p"), c % 7)
        .as("policy_arn")): _*)
  }

  /** iam_list_groups (aws_collect.py:316) + attached group policies
    * (:327) — the g<0-9> group universe, per account. */
  def iamGroups(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"),
        explode(expr("sequence(0, 9)")).as("__g"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        nstr("error"), lit("/").as("path"),
        concat_ws("", lit("AGPA"), col("__g")).as("group_id"),
        concat_ws("", lit("g"), col("__g")).as("group_name"),
        concat_ws("", lit("arn:aws:iam::"), acct(k), lit(":group/g"),
          col("__g")).as("arn"),
        lit("2023-06-01 00:00:00").cast("timestamp").as("create_date"))
  }

  def attachedGroupPolicies(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"),
        explode(expr("sequence(0, 9)")).as("__g"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        concat_ws("", lit("g"), col("__g")).as("group_name"),
        nstr("error"),
        concat_ws("", lit("p"), (col("__g") + k) % 7).as("policy_name"),
        concat_ws("", lit("arn:aws:iam::aws:policy/p"), (col("__g") + k) % 7)
          .as("policy_arn"))
  }

  /** iam_list_roles (aws_collect.py:336) + per-role inline policies
    * (:354) + their documents (:362) — the r<0-9> role universe. */
  def iamRoles(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"),
        explode(expr("sequence(0, 9)")).as("__r"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        nstr("error"), lit("/").as("path"),
        concat_ws("", lit("r"), col("__r")).as("role_name"),
        concat_ws("", lit("AROA"), col("__r")).as("role_id"),
        concat_ws("", lit("arn:aws:iam::"), acct(k), lit(":role/r"),
          col("__r")).as("arn"),
        lit("2023-06-01 00:00:00").cast("timestamp").as("create_date"),
        lit("""{"Statement":[{"Effect":"Allow","Principal":{"Service":"ec2.amazonaws.com"},"Action":"sts:AssumeRole"}]}""")
          .as("assume_role_policy_document"),
        nstr("description"),
        lit(3600L).as("max_session_duration"),
        nstr("permissions_boundary_type"),
        nstr("permissions_boundary_arn"), nstr("tags"),
        nstr("role_last_used"))
  }

  def rolePolicies(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"),
        explode(expr("sequence(0, 9)")).as("__r"))
      .filter(col("__r") % 2 === 0)
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        concat_ws("", lit("r"), col("__r")).as("role_name"),
        nstr("error"),
        concat_ws("", lit("inline-r"), col("__r")).as("policy_name"))
  }

  def rolePolicyDocuments(nation: DataFrame): DataFrame =
    rolePolicies(nation)
      .select(col("recorded_at"), col("account_id"), col("role_name"),
        col("policy_name"),
        lit(null).cast("string").as("error"),
        format_string(
          """{"Statement":[{"Effect":"Allow","Action":"s3:GetObject","Resource":"arn:aws:s3:::%s/*"}]}""",
          concat(lit("b-"), col("role_name"))).as("policy_document"))

  /** iam_list_policies (aws_collect.py:371): both policy families —
    * the aws-managed p<0-6> and the customer-managed cp<0-8> of
    * [[policyVersions]]. */
  def iamPolicies(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    val managed = nation.filter(k < 7).select(
      d2.as("recorded_at"), lit("aws").as("account_id"), nstr("error"),
      concat_ws("", lit("p"), k).as("policy_name"),
      concat_ws("", lit("ANPA"), k).as("policy_id"),
      concat_ws("", lit("arn:aws:iam::aws:policy/p"), k).as("arn"),
      lit("/").as("path"), lit("v1").as("default_version_id"),
      (k + 1).cast("long").as("attachment_count"),
      lit(0L).as("permissions_boundary_usage_count"),
      lit(true).as("is_attachable"), nstr("description"),
      lit("2023-01-01 00:00:00").cast("timestamp").as("create_date"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("update_date"))
    val custom = nation
      .select(col("n_nationkey"),
        explode(expr("sequence(0, 8)")).as("__p"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        nstr("error"),
        concat_ws("", lit("cp"), col("__p")).as("policy_name"),
        concat_ws("", lit("ANPAC"), col("__p")).as("policy_id"),
        concat_ws("", lit("arn:aws:iam::"), acct(k), lit(":policy/cp"),
          col("__p")).as("arn"),
        lit("/").as("path"), lit("v2").as("default_version_id"),
        ((col("__p") + k) % 4).cast("long").as("attachment_count"),
        lit(0L).as("permissions_boundary_usage_count"),
        lit(true).as("is_attachable"), nstr("description"),
        lit("2023-01-01 00:00:00").cast("timestamp").as("create_date"),
        lit("2023-06-01 00:00:00").cast("timestamp").as("update_date"))
    managed.unionByName(custom)
  }

  /** s3_list_buckets / get_bucket_acl / get_bucket_logging
    * (aws_collect.py:423-461) over the ct-logs-<k>-<t> bucket
    * universe of [[describeTrails]]/[[bucketPolicies]]. */
  private def bucketRows(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"), explode(array(lit(0), lit(1))).as("__t"))
      .select(col("n_nationkey"), col("__t"),
        acct(k).as("account_id"),
        concat_ws("-", lit("ct-logs"), k, col("__t")).as("bucket"))
  }

  def s3Buckets(nation: DataFrame): DataFrame =
    bucketRows(nation).select(
      d2.as("recorded_at"), col("account_id"), nstr("error"),
      col("bucket").as("bucket_name"),
      lit("2023-02-01 00:00:00").cast("timestamp")
        .as("bucket_creation_date"),
      lit("ops").as("owner_display_name"),
      md5(col("account_id")).as("owner_id"))

  def bucketAcls(nation: DataFrame): DataFrame =
    bucketRows(nation).select(
      d2.as("recorded_at"), col("account_id"), nstr("error"),
      col("bucket"),
      when((col("n_nationkey") + col("__t")) % 6 === 0,
        lit("""{"URI":"http://acs.amazonaws.com/groups/global/AllUsers"}"""))
        .otherwise(format_string("""{"ID":"%s"}""", md5(col("account_id"))))
        .as("grants_grantee"),
      lit("READ").as("grants_permission"),
      lit("ops").as("owner_display_name"),
      md5(col("account_id")).as("owner_id"))

  def bucketLogging(nation: DataFrame): DataFrame =
    bucketRows(nation).select(
      d2.as("recorded_at"), col("account_id"), nstr("error"),
      col("bucket"),
      when(col("__t") === 0, concat_ws("", lit("access-logs-"),
        col("n_nationkey"))).as("target_bucket"),
      lit(null).cast("string").as("target_grants"),
      when(col("__t") === 0, lit("s3/")).as("target_prefix"))

  /** cloudtrail_get_trail_status (aws_collect.py:485) +
    * get_event_selectors (:510) over the trail-<k>-<t> universe. */
  def trailStatus(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"), explode(array(lit(0), lit(1))).as("__t"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        lit("us-east-1").as("region"),
        concat_ws("", lit("arn:aws:cloudtrail:us-east-1:"), acct(k),
          lit(":trail/trail-"), k, lit("-"), col("__t")).as("trail_arn"),
        nstr("error"),
        ((k + col("__t")) % 4 =!= 0).as("is_logging"),
        nstr("latest_delivery_error"), nstr("latest_notification_error"),
        lit("2024-01-30 00:00:00").cast("timestamp")
          .as("latest_delivery_time"),
        nts("latest_notification_time"),
        lit("2023-02-01 00:00:00").cast("timestamp")
          .as("start_logging_time"),
        nts("stop_logging_time"),
        nstr("latest_cloud_watch_logs_delivery_error"),
        nts("latest_cloud_watch_logs_delivery_time"),
        nts("latest_digest_delivery_time"),
        nstr("latest_digest_delivery_error"),
        nstr("latest_delivery_attempt_time"),
        nstr("latest_notification_attempt_time"),
        nstr("latest_notification_attempt_succeeded"),
        nstr("latest_delivery_attempt_succeeded"),
        nstr("time_logging_started"), nstr("time_logging_stopped"))
  }

  def eventSelectors(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"), explode(array(lit(0), lit(1))).as("__t"))
      .select(d2.as("recorded_at"), acct(k).as("account_id"),
        nstr("error"),
        concat_ws("", lit("arn:aws:cloudtrail:us-east-1:"), acct(k),
          lit(":trail/trail-"), k, lit("-"), col("__t")).as("trail_arn"),
        when((k + col("__t")) % 3 === 0, "All").otherwise("WriteOnly")
          .as("read_write_type"),
        ((k + col("__t")) % 5 =!= 0).as("include_management_events"),
        lit("[]").as("data_resources"),
        lit("[]").as("exclude_management_event_sources"))
  }

  /** inspector_list_findings (aws_collect.py:521) +
    * describe_findings (:529). */
  def inspectorFindingList(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(d2.as("recorded_at"), acct(k).as("account_id"),
      lit("us-east-1").as("region"), nstr("error"),
      format_string("""["arn:aws:inspector:us-east-1:%s:finding/f-%d"]""",
        acct(k), k).as("finding_arns"))
  }

  def inspectorFindings(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(d2.as("recorded_at"), acct(k).as("account_id"),
      nstr("error"),
      concat_ws("", lit("arn:aws:inspector:us-east-1:"), acct(k),
        lit(":finding/f-"), k).as("finding_arns"),
      lit("{}").as("failed_items"),
      concat_ws("", lit("arn:aws:inspector:us-east-1:"), acct(k),
        lit(":finding/f-"), k).as("arn"),
      lit(1L).as("schema_version"),
      lit("Inspector").as("service"), nstr("service_attributes"),
      lit("ec2-instance").as("asset_type"), nstr("asset_attributes"),
      concat_ws("", lit("f-"), k).as("id"),
      concat_ws("", lit("Finding "), k).as("title"),
      nstr("description"), nstr("recommendation"),
      when(k % 3 === 0, "High").when(k % 3 === 1, "Medium")
        .otherwise("Low").as("severity"),
      ((k % 10) + 0.5).as("numeric_severity"),
      lit(10L).as("confidence"),
      (k % 9 === 0).as("indicator_of_compromise"),
      nstr("attributes"), nstr("user_attributes"),
      lit("2024-01-15 00:00:00").cast("timestamp").as("created_at"),
      lit("2024-01-20 00:00:00").cast("timestamp").as("updated_at"))
  }

  /** ec2_describe_security_groups (aws_collect.py:193-206) landed one
    * row per ip_permission; two snapshots — the stale one is wide
    * open (tcp, all ports, 0.0.0.0/0). */
  def securityGroups(s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier)
      .select(acct(k % 25).as("account_id"), col("recorded_at"),
        k.as("__k"), explode(array(lit(0), lit(1))).as("__p"))
      .select(col("account_id"), col("recorded_at"),
        concat_ws("", lit("sg-"), col("__k")).as("group_id"),
        when(col("__k") % 5 === 0, lit("default"))
          .otherwise(concat_ws("", lit("app-"), col("__k")))
          .as("group_name"),
        concat_ws("", lit("group "), col("__k")).as("description"),
        when(isLatest,
          when((col("__k") + col("__p")) % 4 === 0, lit("tcp"))
            .when((col("__k") + col("__p")) % 4 === 1, lit("udp"))
            .when((col("__k") + col("__p")) % 4 === 2, lit("-1"))
            .otherwise(lit("tcp")))
          .otherwise(lit("tcp")).as("prot"),
        when(isLatest,
          when(col("__p") === 0,
            when(col("__k") % 3 === 1, lit(22))
              .when(col("__k") % 3 === 2, lit(1024)))
            .otherwise(
              when(col("__k") % 3 === 0, lit(3389)).otherwise(lit(80))))
          .otherwise(lit(null)).as("range_start"),
        when(isLatest,
          when(col("__p") === 0,
            when(col("__k") % 3 === 1, lit(22))
              .when(col("__k") % 3 === 2, lit(2048)))
            .otherwise(
              when(col("__k") % 3 === 0, lit(3389)).otherwise(lit(80))))
          .otherwise(lit(null)).as("range_end"),
        when(!isLatest || (col("__k") + col("__p")) % 2 === 0,
          lit("""[{"CidrIp":"0.0.0.0/0"}]"""))
          .otherwise(lit("""[{"CidrIp":"10.0.0.0/8"}]"""))
          .as("source_ips_v4"),
        when(isLatest && (col("__k") + col("__p")) % 7 === 0, lit("::/0"))
          .otherwise(lit("[]")).as("source_ips_v6"))
  }

  /** DuckDB twins of every view above, verbatim value logic. One WITH
    * fragment; unreferenced CTEs cost nothing. */
  val CollectCtes: String =
    """WITH snaps(recorded_at) AS (
      |  VALUES (TIMESTAMP '2024-01-29 00:00:00'),
      |         (TIMESTAMP '2024-01-30 00:00:00')
      |), aliases AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    lower(n_name) AS account_alias, recorded_at
      |  FROM nation, snaps
      |  UNION ALL
      |  SELECT '111122223333', 'prod-main', TIMESTAMP '2024-01-30 00:00:00'
      |), alias_dim AS (
      |  SELECT DISTINCT account_id, account_alias FROM aliases
      |), pwpolicy AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    CASE WHEN n_nationkey % 4 = 0 THEN false
      |         WHEN n_nationkey % 4 = 1 THEN NULL
      |         ELSE true END AS require_uppercase_characters,
      |    CASE WHEN n_nationkey % 4 = 2 THEN false
      |         WHEN n_nationkey % 4 = 3 THEN NULL
      |         ELSE true END AS require_lowercase_characters,
      |    CASE WHEN n_nationkey % 3 = 0 THEN false ELSE true END
      |      AS require_symbols,
      |    CASE WHEN n_nationkey % 5 = 0 THEN false
      |         WHEN n_nationkey % 5 = 1 THEN NULL
      |         ELSE true END AS require_numbers,
      |    CASE WHEN n_nationkey % 6 = 0 THEN NULL
      |         ELSE 8 + (n_nationkey * 3) % 10 END
      |      AS minimum_password_length,
      |    CASE WHEN n_nationkey % 4 = 0 THEN NULL
      |         ELSE (n_nationkey * 7) % 30 END AS password_reuse_prevention,
      |    CASE WHEN n_nationkey % 3 = 0 THEN false ELSE true END
      |      AS expire_passwords,
      |    CASE WHEN n_nationkey % 5 = 0 THEN NULL
      |         ELSE 30 + (n_nationkey * 11) % 120 END AS max_password_age
      |  FROM nation
      |), credrep AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    recorded_at, u.usr AS user_name,
      |    'arn:aws:iam::' || CAST(100000000000 + n_nationkey AS VARCHAR) ||
      |      ':' || u.usr AS arn,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE u.usr WHEN '<root_account>' THEN n_nationkey % 4 = 0
      |                 WHEN 'alice' THEN n_nationkey % 2 = 0
      |                 ELSE false END
      |    ELSE true END AS access_key_1_active,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN u.usr = '<root_account>' AND n_nationkey % 8 = 0
      |      ELSE n_nationkey % 2 = 1 END AS access_key_2_active
      |  FROM nation, snaps,
      |    (VALUES ('<root_account>'), ('alice'), ('bob')) u(usr)
      |), acctsum AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    recorded_at,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 6 = 0 THEN 0
      |           WHEN n_nationkey % 6 = 1 THEN NULL
      |           ELSE 1 END
      |    ELSE 0 END AS account_mfa_enabled
      |  FROM nation, snaps
      |), mfadevices AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    'arn:aws:iam::' || CAST(100000000000 + n_nationkey AS VARCHAR) ||
      |      ':mfa/' ||
      |      CASE WHEN n_nationkey % 2 = 0 THEN 'root-account-mfa-device'
      |           ELSE 'user-device' END AS serial_number
      |  FROM nation
      |), entities AS (
      |  SELECT CAST(100000000000 + c_custkey % 25 AS VARCHAR) AS account_id,
      |    TIMESTAMP '2024-01-30 00:00:00' AS recorded_at,
      |    'arn:aws:iam::aws:policy/p' || (c_custkey % 7) AS policy_arn,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'AIDA' || c_custkey END AS user_id,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'u' || (c_custkey % 50) END
      |      AS user_name,
      |    CASE WHEN c_custkey % 3 = 1 THEN 'g' || (c_custkey % 10) END
      |      AS group_name,
      |    CASE WHEN c_custkey % 3 = 2 THEN 'r' || (c_custkey % 10) END
      |      AS role_name
      |  FROM customer
      |  UNION ALL
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR), recorded_at,
      |    'arn:aws:iam::aws:policy/AWSSupportAccess',
      |    NULL, NULL, NULL,
      |    CASE WHEN recorded_at <> TIMESTAMP '2024-01-30 00:00:00'
      |           OR n_nationkey % 3 = 0 THEN 'support' END
      |  FROM nation, snaps
      |), polver AS (
      |  SELECT CAST(100000000000 + c_custkey % 25 AS VARCHAR) AS account_id,
      |    recorded_at,
      |    'arn:aws:iam::' || CAST(100000000000 + c_custkey % 25 AS VARCHAR) ||
      |      ':policy/cp' || (c_custkey % 9) AS policy_arn,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN c_custkey % 5 = 1 THEN 'Deny' ELSE 'Allow' END
      |    ELSE 'Allow' END AS effect,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN c_custkey % 4 = 0 THEN '*'
      |           WHEN c_custkey % 4 = 1 THEN '["*"]'
      |           ELSE 's3:GetObject' END
      |    ELSE '*' END AS action,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN c_custkey % 3 = 0 THEN '*'
      |           ELSE 'arn:aws:s3:::b' || (c_custkey % 20) END
      |    ELSE '*' END AS resource
      |  FROM customer, snaps
      |), trails AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    recorded_at,
      |    'trail-' || n_nationkey || '-' || t.i AS name,
      |    'ct-logs-' || n_nationkey || '-' || t.i AS s3_bucket_name,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN (n_nationkey + t.i) % 3 = 0 THEN 'FALSE' ELSE 'TRUE' END
      |    ELSE 'FALSE' END AS log_file_validation_enabled
      |  FROM nation, snaps, (VALUES (0), (1)) t(i)
      |), bucketpol0 AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    'ct-logs-' || n_nationkey || '-' || t.i AS bucket,
      |    (n_nationkey * 2 + t.i) % 5 AS bt
      |  FROM nation, (VALUES (0), (1)) t(i)
      |), bucketpol1 AS (
      |  SELECT account_id, bucket,
      |    CASE bt
      |      WHEN 0 THEN ['{"Effect":"Allow","Principal":"*","Action":"s3:GetObject","Resource":"arn:aws:s3:::' || bucket || '/*"}']
      |      WHEN 1 THEN ['{"Effect":"Allow","Principal":{"AWS":"*"},"Action":"s3:GetObject","Resource":"arn:aws:s3:::' || bucket || '/*"}']
      |      WHEN 2 THEN ['{"Effect":"Allow","Principal":"*","Action":"s3:GetObject","Condition":{"ArnEquals":{"aws:SourceArn":"arn:aws:iam::' || account_id || ':role/ct"}}}']
      |      WHEN 3 THEN ['{"Effect":"Allow","Principal":{"AWS":"arn:aws:iam::' || account_id || ':root"},"Action":"s3:GetObject"}']
      |      ELSE ['{"Effect":"Allow","Principal":"*","Action":"s3:GetObject","Resource":"arn:aws:s3:::' || bucket || '/*"}',
      |            '{"Effect":"Deny","Condition":{"StringNotEquals":{"aws:SourceVpc":"vpc-1"}}}']
      |    END AS blocks
      |  FROM bucketpol0
      |), bucketpol AS (
      |  SELECT account_id, bucket,
      |    '{"Statement":[' || array_to_string(blocks, ',') || ']}' AS policy,
      |    UNNEST(blocks) AS policy_block
      |  FROM bucketpol1
      |), configrec AS (
      |  SELECT CAST(100000000000 + n_nationkey AS VARCHAR) AS account_id,
      |    'default' AS name, true AS all_supported,
      |    (n_nationkey % 6 = 0) AS include_global
      |  FROM nation WHERE n_nationkey % 3 = 0
      |), sgperms AS (
      |  SELECT CAST(100000000000 + s_suppkey % 25 AS VARCHAR) AS account_id,
      |    recorded_at,
      |    'sg-' || s_suppkey AS group_id,
      |    CASE WHEN s_suppkey % 5 = 0 THEN 'default'
      |         ELSE 'app-' || s_suppkey END AS group_name,
      |    'group ' || s_suppkey AS description,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE (s_suppkey + p.i) % 4 WHEN 0 THEN 'tcp' WHEN 1 THEN 'udp'
      |           WHEN 2 THEN '-1' ELSE 'tcp' END
      |    ELSE 'tcp' END AS prot,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN p.i = 0 THEN
      |        (CASE WHEN s_suppkey % 3 = 1 THEN 22
      |              WHEN s_suppkey % 3 = 2 THEN 1024 END)
      |      ELSE (CASE WHEN s_suppkey % 3 = 0 THEN 3389 ELSE 80 END) END
      |    END AS range_start,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN p.i = 0 THEN
      |        (CASE WHEN s_suppkey % 3 = 1 THEN 22
      |              WHEN s_suppkey % 3 = 2 THEN 2048 END)
      |      ELSE (CASE WHEN s_suppkey % 3 = 0 THEN 3389 ELSE 80 END) END
      |    END AS range_end,
      |    CASE WHEN recorded_at <> TIMESTAMP '2024-01-30 00:00:00'
      |           OR (s_suppkey + p.i) % 2 = 0
      |      THEN '[{"CidrIp":"0.0.0.0/0"}]'
      |      ELSE '[{"CidrIp":"10.0.0.0/8"}]' END AS source_ips_v4,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |           AND (s_suppkey + p.i) % 7 = 0
      |      THEN '::/0' ELSE '[]' END AS source_ips_v6
      |  FROM supplier, snaps, (VALUES (0), (1)) p(i)
      |)""".stripMargin

  /** Per-(session, sf-dir) persisted snapshot views — the landed
    * `aws_collect_*` tables (connectors/aws_collect.py lands each API
    * response once per collection cycle; the 20 CIS rules then scan
    * the landed tables). Raw views only: latest-snapshot dedup and
    * recency windows stay inside the rules so the stale-snapshot traps
    * keep biting. The broadcast alias dimension is persisted too — it
    * is left-joined by every rule. */
  object Shared {
    import graft.Tables.t
    private def v(s: SparkSession, dir: String, name: String)(
        b: => DataFrame): DataFrame =
      SharedFrames.get(s, dir, "aws_" + name)(b)
    private def nat(s: SparkSession, dir: String) = t(s, dir, "nation")

    // re-hint outside the persisted frame: a broadcast hint inside an
    // InMemoryRelation does not reach the consuming join's planning
    def aliasDim(s: SparkSession, dir: String): DataFrame =
      broadcast(v(s, dir, "alias_dim")(
        AwsCollectViews.aliasDim(s, nat(s, dir))))
    def passwordPolicy(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "password_policy")(
        AwsCollectViews.passwordPolicy(nat(s, dir)))
    def credentialReport(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "credential_report")(
        AwsCollectViews.credentialReport(s, nat(s, dir)))
    def accountSummary(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "account_summary")(
        AwsCollectViews.accountSummary(s, nat(s, dir)))
    def virtualMfaDevices(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "virtual_mfa_devices")(
        AwsCollectViews.virtualMfaDevices(nat(s, dir)))
    def entitiesForPolicy(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "entities_for_policy")(
        AwsCollectViews.entitiesForPolicy(
          s, t(s, dir, "customer"), nat(s, dir)))
    def policyVersions(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "policy_versions")(
        AwsCollectViews.policyVersions(s, t(s, dir, "customer")))
    def describeTrails(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "describe_trails")(
        AwsCollectViews.describeTrails(s, nat(s, dir)))
    def bucketPolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "bucket_policies")(
        AwsCollectViews.bucketPolicies(s, nat(s, dir)))
    def configRecorders(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "config_recorders")(
        AwsCollectViews.configRecorders(nat(s, dir)))
    def securityGroups(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "security_groups")(
        AwsCollectViews.securityGroups(s, t(s, dir, "supplier")))
    private def cus(s: SparkSession, dir: String) = t(s, dir, "customer")
    private def sup(s: SparkSession, dir: String) = t(s, dir, "supplier")
    def generateCredentialReport(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "generate_credential_report")(
        AwsCollectViews.generateCredentialReport(nat(s, dir)))
    def ec2Instances(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "ec2_instances")(AwsCollectViews.ec2Instances(cus(s, dir)))
    def ec2RouteTables(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "ec2_route_tables")(
        AwsCollectViews.ec2RouteTables(sup(s, dir)))
    def kmsKeys(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "kms_keys")(AwsCollectViews.kmsKeys(sup(s, dir)))
    def kmsKeyRotation(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "kms_key_rotation")(
        AwsCollectViews.kmsKeyRotation(sup(s, dir)))
    def loginProfiles(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "login_profiles")(
        AwsCollectViews.loginProfiles(cus(s, dir)))
    def mfaDevices(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "mfa_devices")(AwsCollectViews.mfaDevices(cus(s, dir)))
    def accessKeys(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "access_keys")(AwsCollectViews.accessKeys(cus(s, dir)))
    def groupsForUser(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "groups_for_user")(
        AwsCollectViews.groupsForUser(cus(s, dir)))
    def userPolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "user_policies")(
        AwsCollectViews.userPolicies(cus(s, dir)))
    def attachedUserPolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "attached_user_policies")(
        AwsCollectViews.attachedUserPolicies(cus(s, dir)))
    def iamGroups(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "iam_groups")(AwsCollectViews.iamGroups(nat(s, dir)))
    def attachedGroupPolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "attached_group_policies")(
        AwsCollectViews.attachedGroupPolicies(nat(s, dir)))
    def iamRoles(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "iam_roles")(AwsCollectViews.iamRoles(nat(s, dir)))
    def rolePolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "role_policies")(AwsCollectViews.rolePolicies(nat(s, dir)))
    def rolePolicyDocuments(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "role_policy_documents")(
        AwsCollectViews.rolePolicyDocuments(nat(s, dir)))
    def iamPolicies(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "iam_policies")(AwsCollectViews.iamPolicies(nat(s, dir)))
    def s3Buckets(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "s3_buckets")(AwsCollectViews.s3Buckets(nat(s, dir)))
    def bucketAcls(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "bucket_acls")(AwsCollectViews.bucketAcls(nat(s, dir)))
    def bucketLogging(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "bucket_logging")(
        AwsCollectViews.bucketLogging(nat(s, dir)))
    def trailStatus(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "trail_status")(AwsCollectViews.trailStatus(nat(s, dir)))
    def eventSelectors(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "event_selectors")(
        AwsCollectViews.eventSelectors(nat(s, dir)))
    def inspectorFindingList(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "inspector_finding_list")(
        AwsCollectViews.inspectorFindingList(nat(s, dir)))
    def inspectorFindings(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "inspector_findings")(
        AwsCollectViews.inspectorFindings(nat(s, dir)))
  }
}
