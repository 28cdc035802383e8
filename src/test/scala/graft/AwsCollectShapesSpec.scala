package graft

import org.apache.spark.sql.functions._

import graft.sources.AwsCollectViews

/** The round-13 aws_collect endpoint closure (aws_collect.py:97-556):
  * the ~19 landing shapes no cis_aws_pack rule consumes. Each spec
  * pins the reference column list; the join-graph specs pin that the
  * shapes share key universes (users/groups/roles/policies/buckets/
  * trails/keys) instead of being 19 islands. */
class AwsCollectShapesSpec extends SparkSuite {

  private def nation = Tables.t(spark, Sf, "nation")
  private def customer = Tables.t(spark, Sf, "customer")
  private def supplier = Tables.t(spark, Sf, "supplier")

  test("per-account shapes land the reference column lists") {
    assert(AwsCollectViews.generateCredentialReport(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "state", "description"))
    assert(AwsCollectViews.ec2Instances(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "region", "error", "groups",
        "instances", "owner_id", "requester_id", "reservation_id"))
    assert(AwsCollectViews.ec2RouteTables(supplier).columns.toSeq ==
      Seq("recorded_at", "account_id", "region", "error", "associations",
        "propagating_vgws", "route_table_id", "routes", "tags", "vpc_id",
        "owner_id"))
    assert(AwsCollectViews.kmsKeys(supplier).columns.toSeq ==
      Seq("recorded_at", "account_id", "region", "error", "key_id",
        "key_arn"))
    assert(AwsCollectViews.kmsKeyRotation(supplier).columns.toSeq ==
      Seq("recorded_at", "account_id", "key_arn", "error",
        "key_rotation_enabled"))
  }

  test("per-user fan-out shapes land the reference column lists") {
    assert(AwsCollectViews.loginProfiles(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error",
        "create_date", "password_reset_required"))
    assert(AwsCollectViews.mfaDevices(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error",
        "serial_number", "enable_date"))
    assert(AwsCollectViews.accessKeys(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error",
        "access_key_id", "status", "create_date"))
    assert(AwsCollectViews.groupsForUser(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error", "path",
        "group_name", "group_id", "arn", "create_date"))
    assert(AwsCollectViews.userPolicies(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error",
        "policy_name"))
    assert(AwsCollectViews.attachedUserPolicies(customer).columns.toSeq ==
      Seq("recorded_at", "account_id", "user_name", "error",
        "policy_name", "policy_arn"))
  }

  test("group/role/policy shapes land the reference column lists") {
    assert(AwsCollectViews.iamGroups(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "path", "group_id",
        "group_name", "arn", "create_date"))
    assert(AwsCollectViews.attachedGroupPolicies(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "group_name", "error",
        "policy_name", "policy_arn"))
    assert(AwsCollectViews.iamRoles(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "path", "role_name",
        "role_id", "arn", "create_date", "assume_role_policy_document",
        "description", "max_session_duration",
        "permissions_boundary_type", "permissions_boundary_arn", "tags",
        "role_last_used"))
    assert(AwsCollectViews.rolePolicies(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "role_name", "error",
        "policy_name"))
    assert(AwsCollectViews.rolePolicyDocuments(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "role_name", "policy_name",
        "error", "policy_document"))
    assert(AwsCollectViews.iamPolicies(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "policy_name",
        "policy_id", "arn", "path", "default_version_id",
        "attachment_count", "permissions_boundary_usage_count",
        "is_attachable", "description", "create_date", "update_date"))
  }

  test("s3/cloudtrail/inspector shapes land the reference column lists") {
    assert(AwsCollectViews.s3Buckets(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "bucket_name",
        "bucket_creation_date", "owner_display_name", "owner_id"))
    assert(AwsCollectViews.bucketAcls(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "bucket",
        "grants_grantee", "grants_permission", "owner_display_name",
        "owner_id"))
    assert(AwsCollectViews.bucketLogging(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "bucket",
        "target_bucket", "target_grants", "target_prefix"))
    assert(AwsCollectViews.trailStatus(nation).columns.length == 22)
    assert(AwsCollectViews.trailStatus(nation).columns.take(6).toSeq ==
      Seq("recorded_at", "account_id", "region", "trail_arn", "error",
        "is_logging"))
    assert(AwsCollectViews.eventSelectors(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "error", "trail_arn",
        "read_write_type", "include_management_events",
        "data_resources", "exclude_management_event_sources"))
    assert(AwsCollectViews.inspectorFindingList(nation).columns.toSeq ==
      Seq("recorded_at", "account_id", "region", "error",
        "finding_arns"))
    assert(AwsCollectViews.inspectorFindings(nation).columns.length == 23)
  }

  test("the inventory is a coherent join graph, not 19 islands") {
    // rotation status joins the key list on key_arn, exactly 1:1
    val keys = AwsCollectViews.kmsKeys(supplier).select(col("key_arn"))
    val rot = AwsCollectViews.kmsKeyRotation(supplier)
    assert(rot.join(keys, Seq("key_arn"), "left_anti").count() == 0)
    assert(rot.count() == keys.count())
    // every user-level row's group membership exists in iam_groups
    val g = AwsCollectViews.iamGroups(nation)
      .select(col("account_id"), col("group_name"))
    val gfu = AwsCollectViews.groupsForUser(customer)
      .select(col("account_id"), col("group_name"))
    assert(gfu.join(g, Seq("account_id", "group_name"), "left_anti")
      .count() == 0)
    // every inline role policy has a document row, 1:1
    val rp = AwsCollectViews.rolePolicies(nation)
      .select(col("account_id"), col("role_name"), col("policy_name"))
    val rpd = AwsCollectViews.rolePolicyDocuments(nation)
      .select(col("account_id"), col("role_name"), col("policy_name"))
    assert(rp.count() == rpd.count() &&
      rp.join(rpd, Seq("account_id", "role_name", "policy_name"),
        "left_anti").count() == 0)
    // attached user/group policies resolve in iam_policies' arn column
    val pol = AwsCollectViews.iamPolicies(nation)
      .select(col("arn").as("policy_arn")).distinct()
    val aup = AwsCollectViews.attachedUserPolicies(customer)
      .select(col("policy_arn")).distinct()
    assert(aup.join(pol, Seq("policy_arn"), "left_anti").count() == 0)
    // bucket shapes share the trail-bucket universe with bucketPolicies
    val buckets = AwsCollectViews.s3Buckets(nation)
      .select(col("bucket_name").as("bucket")).distinct()
    val acls = AwsCollectViews.bucketAcls(nation)
      .select(col("bucket")).distinct()
    val bp = AwsCollectViews.bucketPolicies(spark, nation)
      .select(col("bucket")).distinct()
    assert(acls.join(buckets, Seq("bucket"), "left_anti").count() == 0)
    assert(bp.join(buckets, Seq("bucket"), "left_anti").count() == 0)
    // trail status + event selectors cover the describeTrails universe
    val trails = AwsCollectViews.describeTrails(spark, nation)
      .select(col("name")).distinct()
    val status = AwsCollectViews.trailStatus(nation)
      .select(regexp_extract(col("trail_arn"), "trail/(.+)$", 1)
        .as("name")).distinct()
    assert(status.join(trails, Seq("name"), "left_anti").count() == 0)
  }
}
