package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loader: each table is one parquet file under the sf dir. */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
      // natively; read the raw int64 nanos and truncate to a µs
      // TimestampType (Spark's native precision — floor, matching how
      // whole-second comparisons behave in ns engines).
      // The conf is (re)set here rather than only at session build
      // because the driver smoke-checks with a session it builds itself;
      // the set is idempotent and safe per-read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Write `events` in the production layout SURVEY §5 describes: a
    * date-partitioned parquet table (one directory per event date), so
    * time-windowed rules prune partitions at the source. */
  def writePartitionedEvents(
      spark: SparkSession, sfDir: String, outPath: String): Unit =
    t(spark, sfDir, "events")
      .withColumn("date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("date").parquet(outPath)

  def partitionedEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Rule time-window over a date-partitioned event table: the ts
    * predicate does the exact windowing, the derived date predicate is
    * what Catalyst turns into partition pruning (only matching date
    * directories are listed/scanned). */
  def timeWindow(events: DataFrame, fromTs: String, toTsExclusive: String): DataFrame = {
    val from = lit(fromTs).cast("timestamp")
    val to = lit(toTsExclusive).cast("timestamp")
    events.filter(
      col("date") >= to_date(from) && col("date") <= to_date(to) &&
        col("ts") >= from && col("ts") < to)
  }
}
