package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed osquery result-log connector (ref:
  * src/connectors/osquery_log.py LANDING_TABLE_COLUMNS, lines 48-62):
  * snapshot/differential results with the queried columns kept as a raw
  * JSON map next to typed envelope fields.
  */
object Osquery {

  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("action", StringType),
    StructField("hostIdentifier", StringType),
    StructField("calendarTime", StringType),
    StructField("unixTime", LongType),
    StructField("epoch", LongType),
    StructField("counter", LongType),
    StructField("columns", MapType(StringType, StringType)),
    StructField("decorations", MapType(StringType, StringType))))

  def land(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, schema)
      .select(
        col("raw"),
        to_timestamp(col("unixTime")).as("event_time"),
        col("action"),
        col("calendarTime").as("calendartime"),
        col("columns"),
        col("counter"),
        col("epoch"),
        col("hostIdentifier").as("hostidentifier"),
        col("name"),
        col("decorations"))
}

/** Typed Azure activity/audit log connector (ref:
  * src/connectors/azure_log.py LANDING_TABLES_COLUMNS['operation'],
  * lines 73-96).
  */
object AzureLog {

  val operationSchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("callerIpAddress", StringType),
    StructField("category", StringType),
    StructField("correlationId", StringType),
    StructField("durationMs", LongType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("operationName", StringType),
    StructField("resourceId", StringType),
    StructField("resultSignature", StringType),
    StructField("resultType", StringType),
    StructField("identity", StructType(Seq(
      StructField("authorization", StructType(Seq(
        StructField("action", StringType),
        StructField("scope", StringType)))),
      StructField("claims", MapType(StringType, StringType)))))))

  def landOperations(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, operationSchema)
      .select(
        col("raw"),
        col("callerIpAddress").as("caller_ip_address"),
        col("category"),
        col("correlationId").as("correlation_id"),
        col("durationMs").as("duration_ms"),
        col("identity.authorization.action")
          .as("identity_authorization_action"),
        col("identity.authorization.scope")
          .as("identity_authorization_scope"),
        col("level"),
        col("location"),
        col("operationName").as("operation_name"),
        col("resourceId").as("resource_id"),
        col("resultSignature").as("result_signature"),
        col("resultType").as("result_type"),
        col("time").as("event_time"),
        current_timestamp().as("loaded_on"))
}

/** Typed G Suite admin-activity connector (ref:
  * src/connectors/gsuite_logs.py LANDING_TABLES_COLUMNS['login'],
  * lines 50-63, and the ingest mapping at 110-160): nested
  * reports-API activity records → flat landing columns; the event
  * parameter list becomes a key→value map exactly like the reference's
  * dict comprehension (value, else boolValue, else multiValue). */
object GSuiteLogs {

  val schema: StructType = StructType(Seq(
    StructField("id", StructType(Seq(
      StructField("time", TimestampType),
      StructField("customerId", StringType)))),
    StructField("etag", StringType),
    StructField("ipAddress", StringType),
    StructField("actor", StructType(Seq(
      StructField("email", StringType),
      StructField("profileId", StringType)))),
    StructField("events", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("parameters", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("value", StringType),
        StructField("boolValue", BooleanType),
        StructField("multiValue", ArrayType(StringType))))))))))))

  def land(
      spark: SparkSession, path: String,
      delegatingSubject: String = ""): DataFrame =
    Connectors.jsonLines(spark, path, schema)
      .select(
        current_timestamp().as("created_on"),
        col("id.time").as("event_time"),
        regexp_replace(col("etag"), "^\"|\"$", "").as("etag"),
        lit(delegatingSubject).as("delegating_subject"),
        // get() is 0-based and null on out-of-bounds — a record with
        // "events":[] lands with null event_name instead of throwing
        // under ANSI element_at
        get(col("events"), lit(0)).getField("name").as("event_name"),
        // last-wins per parameter name (the reference's dict
        // comprehension semantics); null-named and duplicate parameters
        // must not abort the landing job (ANSI map_from_entries throws
        // on duplicate keys)
        map_from_entries(expr(
          """transform(
            |  array_distinct(transform(
            |    filter(coalesce(get(events, 0).parameters, array()),
            |           p -> p.name IS NOT NULL),
            |    p -> p.name)),
            |  n -> struct(n, element_at(
            |    transform(
            |      filter(coalesce(get(events, 0).parameters, array()),
            |             p -> p.name = n),
            |      p -> coalesce(p.value, cast(p.boolValue as string),
            |                    array_join(p.multiValue, ','))), -1)))"""
            .stripMargin))
          .as("event_params"),
        col("id.customerId").as("customer_id"),
        col("actor.email").as("actor_email"),
        col("actor.profileId").as("actor_profile_id"),
        col("ipAddress").as("ip_address"),
        col("raw"))
}

/** Typed Cisco Umbrella device-snapshot connector (ref:
  * src/connectors/cisco_umbrella.py LANDING_TABLE_COLUMNS, lines
  * 41-57): management-API device records landed as a timestamped
  * snapshot. */
object UmbrellaDevices {

  val schema: StructType = StructType(Seq(
    StructField("deviceId", StringType),
    StructField("osVersionName", StringType),
    StructField("lastSyncStatus", StringType),
    StructField("type", StringType),
    StructField("version", StringType),
    StructField("lastSync", TimestampType),
    StructField("osVersion", StringType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("originId", LongType),
    StructField("appliedBundle", LongType),
    StructField("hasIpBlocking", BooleanType)))

  def land(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, schema)
      .select(
        current_timestamp().as("snapshot_at"),
        col("raw"),
        col("deviceId").as("device_id"),
        col("osVersionName").as("os_version_name"),
        col("lastSyncStatus").as("last_sync_status"),
        col("type"),
        col("version"),
        col("lastSync").as("last_sync"),
        col("osVersion").as("os_version"),
        col("name"),
        col("status"),
        col("originId").as("origin_id"),
        col("appliedBundle").as("applied_bundle"),
        col("hasIpBlocking").as("has_ip_blocking"))
}

/** Typed LDAP-log CSV connector (ref: src/connectors/ldap_log.py
  * LANDING_TABLE_COLUMNS, lines 49-58): directory-account exports with
  * password-lifecycle timestamps. */
object LdapLog {

  val schema: StructType = StructType(Seq(
    StructField("group_name", StringType),
    StructField("display_name", StringType),
    StructField("sam", StringType),
    StructField("email", StringType),
    StructField("account_created", TimestampType),
    StructField("account_last_modified", TimestampType),
    StructField("password_last_set", TimestampType),
    StructField("password_expires", TimestampType)))

  def land(spark: SparkSession, path: String): DataFrame =
    Connectors.csvInventory(spark, path, schema)
}

/** Typed AWS VPC Flow Log connector (ref: src/connectors/aws_flow_log
  * .py LANDING_TABLE_COLUMNS, lines 48-63): the default
  * space-separated v2 flow-log format parsed into the landing shape,
  * with '-' placeholders nulled like the reference's NULL_IF. The
  * reference's connect() also lands `data.network_protocol_mapping`
  * from protocol_table.csv next to the flow-log table (aws_flow_log
  * .py:65-72, 109-111 — PROTOCOL_MAPPING_TABLE_COLUMNS) so rules can
  * name protocols instead of IANA numbers; [[landProtocolMapping]] is
  * that dimension lander and [[withProtocolNames]] the enrichment
  * view (a ≤256-row dim — always broadcast). */
object AwsFlowLog {

  private val FlowPattern =
    """^(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\d+) (\d+) (\S+) (\S+)$"""
  private val FlowFields = Seq("version", "account_id", "interface_id",
    "srcaddr", "dstaddr", "srcport", "dstport", "protocol", "packets",
    "bytes", "start_time", "end_time", "action", "log_status")

  def land(spark: SparkSession, path: String): DataFrame = {
    val parsed = Connectors.regexTextLog(spark, path, FlowPattern, FlowFields)
    def dash(c: String) = when(col(c) === "-", lit(null)).otherwise(col(c))
    parsed.select(
      col("raw"),
      col("version").cast("long").as("version"),
      col("account_id"),
      col("interface_id"),
      dash("srcaddr").as("srcaddr"),
      dash("dstaddr").as("dstaddr"),
      dash("srcport").cast("long").as("srcport"),
      dash("dstport").cast("long").as("dstport"),
      dash("protocol").cast("long").as("protocol"),
      dash("packets").cast("long").as("packets"),
      dash("bytes").cast("long").as("bytes"),
      to_timestamp(col("start_time").cast("long")).as("start_time"),
      to_timestamp(col("end_time").cast("long")).as("end_time"),
      col("action"),
      col("log_status"))
  }

  /** The IANA protocol-number dimension (ref PROTOCOL_MAPPING_TABLE_
    * COLUMNS: PROTOCOL_ID / PROTOCOL_KEYWORD / PROTOCOL_NAME /
    * PROTOCOL_IPV6_EXTENSION_HEADER). The source CSV marks the ipv6
    * flag Y/N (protocol_table.csv), which Snowflake's BOOLEAN ingest
    * accepts but Spark's CSV reader does not — read it as a string
    * and map {Y,N} explicitly; empty cells null like the reference's
    * NULL_IF=(''). */
  private val mappingRawSchema: StructType = StructType(Seq(
    StructField("protocol_id", LongType),
    StructField("protocol_keyword", StringType),
    StructField("protocol_name", StringType),
    StructField("ipv6_ext_raw", StringType)))

  def landProtocolMapping(spark: SparkSession, path: String): DataFrame =
    Connectors.csvInventory(spark, path, mappingRawSchema)
      .select(
        col("protocol_id"),
        col("protocol_keyword"),
        col("protocol_name"),
        when(upper(col("ipv6_ext_raw")) === "Y", lit(true))
          .when(upper(col("ipv6_ext_raw")) === "N", lit(false))
          .otherwise(lit(null).cast("boolean"))
          .as("protocol_ipv6_extension_header"))

  /** Enrichment view: flow rows joined to the protocol dimension on
    * PROTOCOL = PROTOCOL_ID. Left join (unknown/nulled protocol keeps
    * the row) with the dimension broadcast — the mapping is the full
    * 8-bit IANA space at most, never worth a shuffle at any scale. */
  def withProtocolNames(flows: DataFrame, mapping: DataFrame): DataFrame =
    flows.join(
      broadcast(mapping),
      flows("protocol") === mapping("protocol_id"),
      "left")
      .drop("protocol_id")
}

/** Typed Meraki device-snapshot connector (ref:
  * src/connectors/meraki_devices.py LANDING_TABLE_COLUMNS_DEVICE,
  * lines 54-71). */
object MerakiDevices {

  val deviceSchema: StructType = StructType(Seq(
    StructField("serial", StringType),
    StructField("address", StringType),
    StructField("name", StringType),
    StructField("networkId", StringType),
    StructField("model", StringType),
    StructField("mac", StringType),
    StructField("lanIp", StringType),
    StructField("wan1Ip", StringType),
    StructField("wan2Ip", StringType),
    StructField("tags", StringType),
    StructField("lng", DoubleType),
    StructField("lat", DoubleType)))

  def landDevices(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, deviceSchema)
      .select(
        current_timestamp().as("snapshot_at"),
        col("raw"),
        col("serial"),
        col("address"),
        col("name"),
        col("networkId").as("network_id"),
        col("model"),
        col("mac"),
        col("lanIp").as("lan_ip"),
        col("wan1Ip").as("wan_1_ip"),
        col("wan2Ip").as("wan_2_ip"),
        col("tags"),
        col("lng"),
        col("lat"))
}

/** Salesforce event-log landing (ref:
  * src/connectors/salesforce_event_log.py LANDING_TABLE_COLUMNS, line
  * 58: a raw-VARIANT-only landing table; typed views are derived
  * downstream). The derived view here projects the event-monitoring
  * fields common to all log types. */
object SalesforceEventLog {

  def land(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(col("value").as("raw"))

  /** data.*_v-style typed view over the raw landing. */
  def eventView(landed: DataFrame): DataFrame =
    landed.select(
      col("raw"),
      get_json_object(col("raw"), "$.EVENT_TYPE").as("event_type"),
      to_timestamp(get_json_object(col("raw"), "$.TIMESTAMP_DERIVED"))
        .as("event_time"),
      get_json_object(col("raw"), "$.USER_ID").as("user_id"),
      get_json_object(col("raw"), "$.SOURCE_IP").as("source_ip"),
      get_json_object(col("raw"), "$.LOGIN_STATUS").as("login_status"),
      get_json_object(col("raw"), "$.BROWSER_TYPE").as("browser_type"))
}

/** AWS API-inventory collection, the aws_collect.py pattern (ref:
  * src/connectors/aws_collect.py LANDING_TABLES_COLUMNS, lines
  * 245-257): each API call's response lands as a typed per-call table
  * stamped with (recorded_at, account_id). One representative table —
  * iam_list_users — plus the generic response→landing shape. */
object AwsCollect {

  val iamUsersSchema: StructType = StructType(Seq(
    StructField("Path", StringType),
    StructField("UserName", StringType),
    StructField("UserId", StringType),
    StructField("Arn", StringType),
    StructField("CreateDate", TimestampType),
    StructField("PasswordLastUsed", TimestampType)))

  /** Land one account's iam.list_users response page (JSON lines of
    * User objects, as the collector receives them). */
  def landIamUsers(
      spark: SparkSession, path: String, accountId: String): DataFrame =
    Connectors.jsonLines(spark, path, iamUsersSchema)
      .select(
        current_timestamp().as("recorded_at"),
        lit(accountId).as("account_id"),
        col("Path").as("path"),
        col("UserName").as("user_name"),
        col("UserId").as("user_id"),
        col("Arn").as("arn"),
        col("CreateDate").as("create_date"),
        col("PasswordLastUsed").as("password_last_used"),
        col("raw"))
}

/** Duo admin-log landing (ref: src/connectors/duo_collect.py
  * LANDING_ADMIN_TABLE_COLUMNS, lines 45-48: raw VARIANT +
  * recorded_at) with the typed view the monitoring rules consume. */
object DuoCollect {

  def landAdminLogs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"),
        current_timestamp().as("recorded_at"))

  def adminView(landed: DataFrame): DataFrame =
    landed.select(
      col("raw"), col("recorded_at"),
      to_timestamp(get_json_object(col("raw"), "$.timestamp").cast("long"))
        .as("event_time"),
      get_json_object(col("raw"), "$.action").as("action"),
      get_json_object(col("raw"), "$.username").as("username"),
      get_json_object(col("raw"), "$.object").as("object"))
}

/** GitHub webhook (push) landing (ref:
  * src/connectors/github_webhooks_s3.py LANDING_TABLE_COLUMNS, lines
  * 50-62). */
object GithubWebhooks {

  val pushSchema: StructType = StructType(Seq(
    StructField("ref", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("created", BooleanType),
    StructField("deleted", BooleanType),
    StructField("forced", BooleanType),
    StructField("base_ref", StringType),
    StructField("compare", StringType),
    StructField("commits", ArrayType(MapType(StringType, StringType)))))

  def landPushEvents(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, pushSchema)
      .select(
        current_timestamp().as("insert_time"),
        col("raw"),
        xxhash64(col("raw")).as("hash_raw"),
        col("ref"),
        col("before"),
        col("after"),
        col("created"),
        col("deleted"),
        col("forced"),
        col("base_ref"),
        col("compare"),
        col("commits"))
}

/** Device-inventory snapshot connectors. Every inventory module in the
  * reference (crowdstrike_devices.py, airwatch_devices.py,
  * jamf_inventory.py, meraki_devices.py ...) lands the same shape —
  * SNAPSHOT_AT + RAW + typed snake_case columns — so the lander is one
  * generic function parameterized by (schema, camelCase→snake renames);
  * each vendor is a config, not a copy. */
object DeviceInventory {

  def land(
      spark: SparkSession, path: String, schema: StructType,
      renames: Seq[(String, String)]): DataFrame =
    Connectors.jsonLines(spark, path, schema)
      .select(current_timestamp().as("snapshot_at") +: col("raw") +:
        renames.map { case (from, to) => col(from).as(to) }: _*)

  /** ref crowdstrike_devices.py LANDING_TABLE_COLUMNS (lines 43-70),
    * key subset. */
  val crowdstrikeSchema: StructType = StructType(Seq(
    StructField("device_id", StringType),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType),
    StructField("hostname", StringType),
    StructField("mac_address", StringType),
    StructField("platform_name", StringType),
    StructField("external_ip", StringType),
    StructField("status", StringType),
    StructField("agent_version", StringType)))

  def landCrowdstrike(spark: SparkSession, path: String): DataFrame =
    land(spark, path, crowdstrikeSchema,
      crowdstrikeSchema.fieldNames.toSeq.map(n => n -> n))

  /** ref airwatch_devices.py LANDING_TABLE_COLUMNS_DEVICE (lines
    * 52-104), key subset. */
  val airwatchSchema: StructType = StructType(Seq(
    StructField("Udid", StringType),
    StructField("SerialNumber", StringType),
    StructField("MacAddress", StringType),
    StructField("DeviceFriendlyName", StringType),
    StructField("UserName", StringType),
    StructField("Model", StringType),
    StructField("OperatingSystem", StringType),
    StructField("LastSeen", TimestampType),
    StructField("CompromisedStatus", BooleanType)))

  def landAirwatch(spark: SparkSession, path: String): DataFrame =
    land(spark, path, airwatchSchema, Seq(
      "Udid" -> "udid", "SerialNumber" -> "serial_number",
      "MacAddress" -> "mac_address",
      "DeviceFriendlyName" -> "device_friendly_name",
      "UserName" -> "user_name", "Model" -> "model",
      "OperatingSystem" -> "operating_system", "LastSeen" -> "last_seen",
      "CompromisedStatus" -> "compromised_status"))
}

/** The connectors-runner loop (ref: src/runners/connectors_runner.py):
  * a registry of scheduled connectors, each landing only records newer
  * than its watermark, with per-connector run metadata. The data plane
  * stays a declarative DataFrame per connector; only the tiny watermark
  * scalar comes back to the driver (exactly the reference's
  * db.fetch_latest contract). */
final case class RegisteredConnector(
    name: String,
    schedule: String,
    tsCol: String,
    land: SparkSession => DataFrame)

object ConnectorRunner {

  /** The reference's 15-minute-task schedule check
    * (connectors_runner.py time_to_run, lines 33-50): supports
    * "0 *" (hourly), "0 star-slash-N" (every N hours), "0 1-13/12". */
  def timeToRun(schedule: String, now: java.time.LocalDateTime): Boolean = {
    val everyN = "^0 \\*/([0-9]+)$".r
    schedule match {
      case "0 1-13/12" => now.getMinute < 15 && now.getHour % 12 == 1
      case "0 *" => now.getMinute < 15
      case everyN(n) => now.getMinute < 15 && now.getHour % n.toInt == 0
      case _ => false
    }
  }

  final case class ConnectorRun(
      name: String, landed: DataFrame, newWatermark: Option[String])

  /** Run one connector incrementally: land rows newer than the
    * watermark, compute the new watermark from the landed batch (one
    * scalar aggregate — the only driver-side value). */
  def runOne(
      spark: SparkSession,
      c: RegisteredConnector,
      watermark: Option[String]): ConnectorRun = {
    val all = c.land(spark)
    val fresh = watermark.fold(all)(w => Connectors.incremental(all, c.tsCol, w))
      .transform(graft.Materialize.frame) // land once; consumers read the batch
    val wm = fresh.agg(max(col(c.tsCol)).cast("string")).head.getString(0)
    ConnectorRun(c.name, fresh, Option(wm).orElse(watermark))
  }

  /** The runner loop over the registry: connectors due at `now` land
    * incrementally; each run records metadata (rows landed, timing)
    * like connection_run does. Returns per-connector results plus the
    * advanced watermarks. */
  def runDue(
      spark: SparkSession,
      registry: Seq[RegisteredConnector],
      watermarks: Map[String, String],
      now: java.time.LocalDateTime,
      log: graft.engine.RunLog): (Seq[ConnectorRun], Map[String, String]) = {
    val runs = registry.filter(c => timeToRun(c.schedule, now)).map { c =>
      val t0 = System.currentTimeMillis()
      try {
        val r = runOne(spark, c, watermarks.get(c.name))
        log.record(c.name, t0, System.currentTimeMillis(),
          inserted = r.landed.count())
        r
      } catch {
        case e: Exception =>
          log.record(c.name, t0, System.currentTimeMillis(),
            error = Some(String.valueOf(e.getMessage)))
          throw e
      }
    }
    val newWms = watermarks ++ runs.flatMap(r =>
      r.newWatermark.map(r.name -> _))
    (runs, newWms)
  }
}
