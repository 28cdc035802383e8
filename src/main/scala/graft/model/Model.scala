package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed rows for the SnowAlert envelope (SURVEY §3/§4 graft.model):
  * the alert schema the reference stores in results.alerts
  * (alert_queries_runner.py's ALERT columns) and the violation schema
  * with identity-hash ids (helpers/db.py INSERT_VIOLATIONS_WITH_ID).
  * The engine works on DataFrames so schemas stay open (rules may carry
  * extra columns); these case classes are the typed boundary for
  * consumers that want compile-time fields — `Model.alerts(df)` /
  * `Model.violations(df)` narrow to the envelope with full Encoder
  * support. `event_data` stays a JSON string (the Spark-side VARIANT
  * stand-in). */
final case class Alert(
    alert_id: String,
    query_name: String,
    query_id: String,
    environment: String,
    sources: String,
    actor: String,
    `object`: String,
    action: String,
    title: String,
    event_time_s: Long,
    alert_time_s: Long,
    description: String,
    detector: String,
    event_data: String,
    severity: String,
    counter: Long)

final case class Violation(
    id: String,
    query_name: String,
    query_id: String,
    title: String,
    `object`: String,
    owner: String,
    severity: String,
    violation_day: java.sql.Date)

object Model {
  implicit val alertEncoder: Encoder[Alert] = Encoders.product[Alert]
  implicit val violationEncoder: Encoder[Violation] =
    Encoders.product[Violation]

  /** Narrow a rule-engine output to the typed alert envelope. */
  def alerts(df: DataFrame): Dataset[Alert] = {
    val cols = alertEncoder.schema.fieldNames
    df.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*).as[Alert]
  }

  /** Narrow a violation-rule output to the typed violation envelope. */
  def violations(df: DataFrame): Dataset[Violation] = {
    val cols = violationEncoder.schema.fieldNames
    df.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*).as[Violation]
  }
}
