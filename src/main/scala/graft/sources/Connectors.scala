package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SURVEY.md §2 #40-43: the connector layer. The reference lands raw
  * JSON/CSV/text logs into tables with a `raw` VARIANT column plus typed
  * projected columns, incrementally by timestamp (reference:
  * src/connectors — aws_cloudtrail.py, nginx_log.py, *_devices.py,
  * utils.py). Here each connector is a Spark reader producing the same
  * shape: `raw` (original record) + typed columns, declaratively, so
  * schema pruning and filter pushdown still apply downstream.
  */
object Connectors {

  /** The shared raw+typed landing projection (one definition for batch
    * and streaming — a schema-handling change applies to both). */
  private def jsonProjection(lines: DataFrame, schema: StructType): DataFrame =
    lines
      .withColumn("raw", col("value"))
      .withColumn("rec", from_json(col("value"), schema))
      .select(col("raw"), col("rec.*"))

  /** JSON-lines connector (cloudtrail-shaped nested JSON). Explicit
    * schema (no inference scan at 100 TB); keeps the raw line. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    jsonProjection(spark.read.text(path), schema)

  /** Streaming variant of jsonLines: the same landing projection over
    * a file-source stream, so every typed connector (CloudTrail, Okta,
    * osquery, ...) lands continuously by pointing its select at this
    * reader — the Structured Streaming analogue of the reference's
    * scheduled connectors_runner polling loop (micro-batches instead of
    * 15-minute cron ticks; the incremental watermark contract is the
    * stream's own file tracking). */
  def jsonLinesStream(
      spark: SparkSession, dir: String, schema: StructType): DataFrame =
    jsonProjection(spark.readStream.format("text").load(dir), schema)

  /** CSV inventory connector (device/asset inventories). */
  def csvInventory(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** Regex text-log connector: one capture group per field (nginx
    * combined-log style). Ref: src/connectors/nginx_log.py. */
  def regexTextLog(
      spark: SparkSession,
      path: String,
      pattern: String,
      fields: Seq[String]): DataFrame = {
    val raw = spark.read.text(path)
    val cols = fields.zipWithIndex.map { case (f, i) =>
      regexp_extract(col("value"), pattern, i + 1).as(f)
    }
    raw.select((col("value").as("raw") +: cols): _*)
  }

  /** Combined nginx access-log preset. */
  val NginxPattern =
    """^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)"""
  val NginxFields = Seq("remote_addr", "remote_user", "time_local",
    "method", "path", "protocol", "status", "body_bytes")

  def nginxLog(spark: SparkSession, path: String): DataFrame =
    regexTextLog(spark, path, NginxPattern, NginxFields)
      .withColumn("status", col("status").cast("int"))
      .withColumn("body_bytes",
        when(col("body_bytes") === "-", 0L)
          .otherwise(col("body_bytes").cast("long")))

  /** Incremental window helper: the connector-runner's "only newer than
    * last landed timestamp" contract (ref: connectors/utils.py). */
  def incremental(df: DataFrame, tsCol: String, fromTs: String): DataFrame =
    df.filter(col(tsCol) > lit(fromTs).cast("timestamp"))

  /** LATERAL FLATTEN over a JSON array column (the reference flattens
    * VARIANT arrays in its data.*_v views / migrations DDL): parse with
    * an explicit element schema, emit one row per element with its
    * index. outer=true keeps rows whose array is null/empty (FLATTEN
    * OUTER => TRUE). */
  def flattenJsonArray(
      df: DataFrame,
      jsonCol: String,
      elemSchema: org.apache.spark.sql.types.DataType,
      outer: Boolean = false): DataFrame = {
    val parsed = from_json(col(jsonCol),
      org.apache.spark.sql.types.ArrayType(elemSchema))
    val ex = if (outer) posexplode_outer(parsed) else posexplode(parsed)
    df.select(df.columns.map(col).toIndexedSeq :+
      ex.as(Seq("pos", "value")): _*)
  }

  /** LATERAL FLATTEN over a JSON object column: one row per (key,
    * value) pair, the OBJECT_CONSTRUCT inverse. */
  def flattenJsonMap(
      df: DataFrame,
      jsonCol: String,
      valueSchema: org.apache.spark.sql.types.DataType): DataFrame = {
    val parsed = from_json(col(jsonCol), org.apache.spark.sql.types
      .MapType(org.apache.spark.sql.types.StringType, valueSchema))
    df.select(df.columns.map(col).toIndexedSeq :+
      explode(parsed).as(Seq("key", "value")): _*)
  }
}
