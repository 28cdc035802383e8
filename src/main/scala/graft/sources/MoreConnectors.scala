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
