package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed Okta connector: system-log and user-snapshot projections, the
  * Spark re-expression of the reference's Okta landing/views
  * (src/connectors/okta.py + packs/okta.sql data.okta_system_logs /
  * data.okta_users views).
  */
object Okta {

  /** Okta system-log record schema (the fields okta.sql's
    * data.okta_system_logs view projects from raw). */
  val systemLogSchema: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("published", TimestampType),
    StructField("eventType", StringType),
    StructField("version", StringType),
    StructField("severity", StringType),
    StructField("displayMessage", StringType),
    StructField("actor", StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType),
      StructField("alternateId", StringType),
      StructField("displayName", StringType)))),
    StructField("client", StructType(Seq(
      StructField("ipAddress", StringType),
      StructField("device", StringType)))),
    StructField("outcome", StructType(Seq(
      StructField("result", StringType),
      StructField("reason", StringType))))))

  /** Okta user snapshot schema (okta.sql data.okta_users_snapshots). */
  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("created", TimestampType),
    StructField("activated", TimestampType),
    StructField("statusChanged", TimestampType),
    StructField("lastLogin", TimestampType),
    StructField("lastUpdated", TimestampType)))

  /** Land system-log JSON lines into the typed view shape
    * (packs/okta.sql data.okta_system_logs). */
  def landSystemLog(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, systemLogSchema)
      .select(
        col("raw"),
        col("published").as("recorded_at"),
        col("uuid"),
        col("published"),
        col("eventType").as("event_type"),
        col("severity"),
        col("displayMessage").as("display_message"),
        col("actor.id").as("actor_id"),
        col("actor.alternateId").as("actor_email"),
        col("actor.displayName").as("actor_name"),
        col("client.ipAddress").as("client_ip"),
        col("outcome.result").as("outcome_result"),
        col("outcome.reason").as("outcome_reason"))

  /** Okta group snapshot schema (okta.sql data.okta_groups_snapshots). */
  val groupSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created", TimestampType),
    StructField("lastUpdated", TimestampType),
    StructField("lastMembershipUpdated", TimestampType),
    StructField("objectClass", ArrayType(StringType)),
    StructField("type", StringType),
    StructField("profile", StructType(Seq(
      StructField("name", StringType),
      StructField("description", StringType))))))

  /** Land group-snapshot JSON lines into the typed view shape
    * (packs/okta.sql data.okta_groups_snapshots — groups view #1). The
    * file connector has no landing-time column, so `recorded_at` is
    * the record's own lastUpdated stamp — monotone across snapshot
    * pulls, preserving the QUALIFY-latest semantics of [[groups]].
    *
    * CONTRACT: this stands in for the reference's landing-time QUALIFY
    * only while pulls are monotone (each snapshot's lastUpdated ≥ the
    * previous landing's). A backfill or re-land of an OLDER record
    * would not win here, where upstream (keyed on landing time) it
    * would. If out-of-order landings are possible, derive recorded_at
    * from landing metadata instead — e.g. select
    * `_metadata.file_modification_time` in the scan — and pass that
    * frame to [[groups]] with the same latest-per-id reduction. */
  def landGroupSnapshots(spark: SparkSession, path: String): DataFrame =
    Connectors.jsonLines(spark, path, groupSchema)
      .select(
        col("raw"),
        col("lastUpdated").as("recorded_at"),
        col("id"),
        col("created"),
        col("lastUpdated").as("last_updated"),
        col("lastMembershipUpdated").as("last_membership_updated"),
        col("objectClass").as("object_class"),
        col("type"),
        col("profile"))

  /** okta.sql data.okta_groups (groups view #2): latest entry seen for
    * each group. */
  def groups(snapshots: DataFrame): DataFrame =
    latestSnapshot(snapshots, "id")

  /** Latest snapshot per entity — okta.sql's
    * `QUALIFY 1=ROW_NUMBER() OVER (PARTITION BY id ORDER BY recorded_at
    * DESC)` view (data.okta_users), as a window + filter: one shuffle
    * on the entity key. */
  def latestSnapshot(snapshots: DataFrame, key: String,
      recordedAt: String = "recorded_at"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(recordedAt).desc)
    snapshots
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
