package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining reference snapshot/inventory connectors, closing the
  * connector surface (ref: src/connectors/{tenable_io, jamf_inventory,
  * assetpanda, aws_config, aws_inventory, aws_accounts,
  * azure_subscription, azure_vm}.py). Each lands a JSON-lines drop into
  * the reference's landing-table shape: `raw` (the original record)
  * plus typed snake_case columns, as a declarative projection — schema
  * pruning and filter pushdown apply downstream, and none of these
  * scans shuffles. VARIANT columns whose value is a nested object land
  * as the raw JSON text of that subtree (`get_json_object`), matching
  * how the reference stores them for later `:path` extraction.
  */
object InventoryConnectors {

  // Each lander takes the land instant as a parameter defaulting to
  // current_timestamp() — the reference stamps one utcnow() per ingest
  // batch, and a per-action re-evaluation of current_timestamp() would
  // stamp retried writes differently; callers that need a fixed batch
  // instant (or a deterministic test) pass a literal.

  // --- tenable_io (tenable_io.py:46-68 landing tables) ---------------

  val tenableUserSchema: StructType = StructType(Seq(
    StructField("username", StringType),
    StructField("uuid", StringType),
    StructField("id", LongType),
    StructField("user_name", StringType),
    StructField("email", StringType),
    StructField("type", StringType),
    StructField("permissions", IntegerType),
    StructField("last_login_attempt", TimestampType),
    StructField("login_fail_count", IntegerType),
    StructField("login_fail_total", IntegerType),
    StructField("enabled", BooleanType),
    StructField("last_login", TimestampType),
    StructField("uuid_id", StringType)))

  /** tenable_io.py:101-140 ingest_users — USER_LANDING_TABLE with the
    * role derived from the permissions code (the reference's literal
    * fallback string, unformatted braces included, is kept verbatim). */
  def landTenableUsers(spark: SparkSession, path: String,
      at: Column = current_timestamp()): DataFrame =
    Connectors.jsonLines(spark, path, tenableUserSchema)
      .select(
        col("username"),
        when(col("permissions") === 16, "Basic")
          .when(col("permissions") === 24, "Scan Operator")
          .when(col("permissions") === 32, "Standard")
          .when(col("permissions") === 40, "Scan Manager")
          .when(col("permissions") === 64, "Administrator")
          .otherwise("unknown permissions {permissions}").as("role"),
        col("raw"), at.as("snapshot_at"),
        col("uuid"), col("id"), col("user_name"), col("email"),
        col("type"), col("permissions").as("permission"),
        col("last_login_attempt"), col("login_fail_count"),
        col("login_fail_total"), col("enabled"),
        get_json_object(col("raw"), "$.two_factor").as("two_factor"),
        col("last_login"), col("uuid_id"))

  /** tenable_io.py:66-68 — agent and vuln exports land raw-only:
    * (raw VARIANT, export_at). */
  def landTenableExport(spark: SparkSession, path: String,
      at: Column = current_timestamp()): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"), at.as("export_at"))

  // --- jamf_inventory (jamf_inventory.py:53-72) -----------------------

  val jamfSchema: StructType = StructType(Seq(
    StructField("computer_id", LongType),
    StructField("recorded_at", TimestampType),
    StructField("general", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("serial_number", StringType),
      StructField("mac_address", StringType),
      StructField("ip_address", StringType),
      StructField("last_contact_time_utc", TimestampType))))))

  /** jamf_inventory.py main(): one row per computer detail fetch —
    * the computer record plus computer_id and the response-date
    * recorded_at; key general.* fields typed for rule predicates. */
  def landJamfComputers(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, jamfSchema)
      .select(col("raw"), col("computer_id"), col("recorded_at"),
        col("general.name").as("name"),
        col("general.serial_number").as("serial_number"),
        col("general.mac_address").as("mac_address"),
        col("general.ip_address").as("ip_address"),
        col("general.last_contact_time_utc").as("last_contact_time_utc"))

  // --- assetpanda (assetpanda.py:38-43) -------------------------------

  private val assetpandaSchema = StructType(Seq(
    StructField("id", StringType)))

  /** assetpanda.py LANDING_TABLE_COLUMNS: IDENTITY insert id + raw +
    * object id + insert time. IDENTITY requires unique increasing ids,
    * not dense ones, so the distributed monotonic id is used — a global
    * row_number would funnel the whole scan through one partition. */
  def landAssetpanda(spark: SparkSession, path: String,
      at: Column = current_timestamp()): DataFrame =
    Connectors.jsonLines(spark, path, assetpandaSchema)
      .select(
        (monotonically_increasing_id() + 1).as("insert_id"),
        col("raw"), col("id"), at.as("insert_at"))

  // --- aws_config (aws_config.py:49-66, 170-193) ----------------------

  val awsConfigSchema: StructType = StructType(Seq(
    StructField("configurationItemCaptureTime", TimestampType),
    StructField("awsAccountId", StringType),
    StructField("awsRegion", StringType),
    StructField("resourceType", StringType),
    StructField("ARN", StringType),
    StructField("availabilityZone", StringType),
    StructField("resourceCreationTime", TimestampType),
    StructField("resourceName", StringType),
    StructField("resourceId", StringType)))

  /** The reference's snowpipe DATE_REGEXP: config drop filenames carry
    * the delivery instant as ...yyyyMMddTHHmmssZ... */
  private val ConfigFileDate =
    """.+(\d{4})(\d{2})(\d{2})T(\d{2})(\d{2})(\d{2})Z.*"""

  /** aws_config.py config_ingest_task: one row per flattened
    * configurationItem — typed capture/identity columns, VARIANT
    * subtrees as JSON text, event_time parsed from the drop filename
    * (the reference's REGEXP_REPLACE on metadata$filename). */
  def landAwsConfig(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, awsConfigSchema)
      .select(
        col("raw"),
        xxhash64(col("raw")).as("hash_raw"),
        regexp_replace(input_file_name(), ConfigFileDate,
          "$1-$2-$3T$4:$5:$6Z").cast("timestamp").as("event_time"),
        col("configurationItemCaptureTime")
          .as("configuration_item_capture_time"),
        col("awsAccountId").as("account_id"),
        col("awsRegion").as("aws_region"),
        col("resourceType").as("resource_type"),
        col("ARN").as("arn"),
        col("availabilityZone").as("availability_zone"),
        col("resourceCreationTime").as("resource_creation_time"),
        col("resourceName").as("resource_name"),
        col("resourceId").as("resource_id"),
        get_json_object(col("raw"), "$.relationships").as("relationships"),
        get_json_object(col("raw"), "$.configuration").as("configuration"),
        get_json_object(col("raw"), "$.tags").as("tags"))

  // --- aws_accounts (aws_accounts.py:41-51) ---------------------------

  val awsAccountsSchema: StructType = StructType(Seq(
    StructField("Arn", StringType),
    StructField("Email", StringType),
    StructField("Id", StringType),
    StructField("JoinedMethod", StringType),
    StructField("JoinedTimestamp", TimestampType),
    StructField("Name", StringType),
    StructField("Status", StringType)))

  /** aws_accounts.py ingest — Organizations list_accounts pages landed
    * with the account Name as account_alias. */
  def landAwsAccounts(spark: SparkSession, path: String,
      at: Column = current_timestamp()): DataFrame =
    Connectors.jsonLines(spark, path, awsAccountsSchema)
      .select(
        col("raw"), at.as("created_at"),
        col("Arn").as("arn"), col("Email").as("email"),
        col("Id").as("account_id"),
        col("JoinedMethod").as("joined_method"),
        col("JoinedTimestamp").as("joined_timestamp"),
        col("Name").as("account_alias"),
        col("Status").as("status"))

  // --- aws_inventory (aws_inventory.py:119-196) -----------------------

  /** The five asset-type landing shapes, each (schema, renames) — the
    * vendor module is a config, not a copy (same generic-lander move as
    * DeviceInventory). Field order follows LANDING_TABLES_COLUMNS. */
  val awsInventoryShapes: Map[String, (StructType, Seq[(String, String)])] =
    Map(
      "EC2" -> (StructType(Seq(
        StructField("InstanceId", StringType),
        StructField("Architecture", StringType),
        StructField("InstanceType", StringType),
        StructField("KeyName", StringType),
        StructField("LaunchTime", TimestampType),
        StructField("RegionName", StringType),
        StructField("State", StructType(Seq(
          StructField("Name", StringType)))),
        StructField("InstanceName", StringType),
        StructField("AccountId", StringType))) -> Seq(
        "InstanceId" -> "instance_id", "Architecture" -> "architecture",
        "InstanceType" -> "instance_type", "KeyName" -> "key_name",
        "LaunchTime" -> "launch_time", "RegionName" -> "region_name",
        "State.Name" -> "instance_state",
        "InstanceName" -> "instance_name", "AccountId" -> "account_id")),
      "SG" -> (StructType(Seq(
        StructField("Description", StringType),
        StructField("GroupId", StringType),
        StructField("GroupName", StringType),
        StructField("AccountId", StringType),
        StructField("RegionName", StringType),
        StructField("VpcId", StringType))) -> Seq(
        "Description" -> "description", "GroupId" -> "group_id",
        "GroupName" -> "group_name", "AccountId" -> "account_id",
        "RegionName" -> "region_name", "VpcId" -> "vpc_id")),
      "ELB" -> (StructType(Seq(
        StructField("CanonicalHostedZoneName", StringType),
        StructField("CanonicalHostedZoneNameID", StringType),
        StructField("CreatedTime", TimestampType),
        StructField("DNSName", StringType),
        StructField("LoadBalancerName", StringType),
        StructField("RegionName", StringType),
        StructField("Scheme", StringType),
        StructField("VPCId", StringType),
        StructField("AccountId", StringType))) -> Seq(
        "CanonicalHostedZoneName" -> "hosted_zone_name",
        "CanonicalHostedZoneNameID" -> "hosted_zone_name_id",
        "CreatedTime" -> "created_time", "DNSName" -> "dns_name",
        "LoadBalancerName" -> "load_balancer_name",
        "RegionName" -> "region_name", "Scheme" -> "scheme",
        "VPCId" -> "vpc_id", "AccountId" -> "account_id")),
      "IAM" -> (StructType(Seq(
        StructField("Path", StringType),
        StructField("UserName", StringType),
        StructField("UserId", StringType),
        StructField("Arn", StringType),
        StructField("CreateDate", TimestampType),
        StructField("PasswordLastUsed", TimestampType),
        StructField("AccountId", StringType))) -> Seq(
        "Path" -> "path", "UserName" -> "user_name",
        "UserId" -> "user_id", "Arn" -> "arn",
        "CreateDate" -> "create_date",
        "PasswordLastUsed" -> "password_last_used",
        "AccountId" -> "account_id")),
      "AMI" -> (StructType(Seq(
        StructField("VirtualizationType", StringType),
        StructField("Description", StringType),
        StructField("Hypervisor", StringType),
        StructField("EnaSupport", BooleanType),
        StructField("SriovNetSupport", StringType),
        StructField("ImageId", StringType),
        StructField("State", StringType),
        StructField("Architecture", StringType),
        StructField("ImageLocation", StringType),
        StructField("RootDeviceType", StringType),
        StructField("RootDeviceName", StringType),
        StructField("OwnerId", StringType),
        StructField("CreationDate", TimestampType),
        StructField("Public", BooleanType),
        StructField("ImageType", StringType),
        StructField("Name", StringType),
        StructField("AccountId", StringType),
        StructField("RegionName", StringType))) -> Seq(
        "VirtualizationType" -> "virtualization_type",
        "Description" -> "description", "Hypervisor" -> "hypervisor",
        "EnaSupport" -> "ena_support",
        "SriovNetSupport" -> "sriov_net_support",
        "ImageId" -> "image_id", "State" -> "state",
        "Architecture" -> "architecture",
        "ImageLocation" -> "image_location",
        "RootDeviceType" -> "root_device_type",
        "RootDeviceName" -> "root_device_name", "OwnerId" -> "owner_id",
        "CreationDate" -> "creation_date", "Public" -> "public",
        "ImageType" -> "image_type", "Name" -> "name",
        "AccountId" -> "account_id", "RegionName" -> "region_name")))

  /** aws_inventory.py create_asset_table/ingest: land one asset type's
    * snapshot (monitored time stamped at land). */
  def landAwsInventory(
      spark: SparkSession, path: String, assetType: String,
      at: Column = current_timestamp()): DataFrame = {
    val (schema, renames) = awsInventoryShapes(assetType)
    Connectors.jsonLines(spark, path, schema)
      .select(col("raw") +: at.as("monitored_time") +:
        renames.map { case (from, to) => col(from).as(to) }: _*)
  }

  // --- azure_subscription (azure_subscription.py:57-67) ---------------

  val azureSubscriptionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("subscription_id", StringType),
    StructField("display_name", StringType),
    StructField("state", StringType),
    StructField("authorization_source", StringType)))

  /** azure_subscription.py ingest — subscriptions listed per tenant;
    * tenant_id is the connection option, subscription_policies stays a
    * VARIANT subtree. */
  def landAzureSubscriptions(
      spark: SparkSession, path: String, tenantId: String,
      at: Column = current_timestamp()): DataFrame =
    Connectors.jsonLines(spark, path, azureSubscriptionSchema)
      .select(
        at.as("event_time"),
        lit(tenantId).as("tenant_id"),
        col("raw"), col("id"), col("subscription_id"),
        col("display_name"), col("state"),
        get_json_object(col("raw"), "$.subscription_policies")
          .as("subscription_policies"),
        col("authorization_source"))

  // --- azure_vm (azure_vm.py:59-74) -----------------------------------

  val azureVmSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("location", StringType),
    StructField("name", StringType),
    StructField("provisioning_state", StringType),
    StructField("type", StringType),
    StructField("vm_id", StringType)))

  /** azure_vm.py ingest — VMs listed per subscription (the
    * subscription_id parameter mirrors GET_SUBSCRIPTION_IDS_SQL's
    * fan-out); profile subtrees stay VARIANT JSON text. */
  def landAzureVms(
      spark: SparkSession, path: String, subscriptionId: String,
      at: Column = current_timestamp()): DataFrame =
    Connectors.jsonLines(spark, path, azureVmSchema)
      .select(
        at.as("event_time"),
        col("raw"),
        get_json_object(col("raw"), "$.hardware_profile")
          .as("hardware_profile"),
        col("id"), col("location"), col("name"),
        get_json_object(col("raw"), "$.network_profile")
          .as("network_profile"),
        get_json_object(col("raw"), "$.os_profile").as("os_profile"),
        col("provisioning_state"),
        get_json_object(col("raw"), "$.storage_profile")
          .as("storage_profile"),
        lit(subscriptionId).as("subscription_id"),
        get_json_object(col("raw"), "$.tags").as("tags"),
        col("type"), col("vm_id"))
}
