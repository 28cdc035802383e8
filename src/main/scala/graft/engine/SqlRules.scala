package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-authored rules: the reference's rules are SQL views
  * (rules.*_alert_query in the packs SQL files) authored by analysts,
  * not code.
  * This wrapper runs such a SELECT through spark.sql and normalizes it
  * into the engine's alert schema, so pack SQL ports near-verbatim and
  * the result composes with mergeAlerts / suppress / correlate /
  * Dispatcher exactly like Column-API rules.
  *
  * Contract: the SELECT must produce columns
  *   id, actor, object, action, title, description, severity,
  *   event_time (timestamp), event_data
  * over temp views the caller registered. Everything else (windowing,
  * deterministic alert_id, envelope constants) is applied here —
  * mirroring what alert_queries_runner.py wraps around the rule view.
  */
object SqlRules {

  def runAlertSql(
      spark: SparkSession,
      sql: String,
      name: String,
      queryId: String,
      fromTs: String,
      toTsExclusive: String,
      alertTimeS: Long,
      environment: String = "prod",
      sources: String = "events",
      detector: String = "graft"): DataFrame =
    spark.sql(sql)
      .filter(
        col("event_time") >= lit(fromTs).cast("timestamp") &&
          col("event_time") < lit(toTsExclusive).cast("timestamp"))
      .select(
        md5(concat_ws(":", lit(name), col("id"))).as("alert_id"),
        lit(name).as("query_name"),
        lit(queryId).as("query_id"),
        lit(environment).as("environment"),
        lit(sources).as("sources"),
        col("actor"),
        col("object"),
        col("action"),
        col("title"),
        col("event_time").cast("long").as("event_time_s"),
        lit(alertTimeS).as("alert_time_s"),
        col("description"),
        lit(detector).as("detector"),
        col("event_data"),
        col("severity"),
        lit(1L).as("counter"))
}
