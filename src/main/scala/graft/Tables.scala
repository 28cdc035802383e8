package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader: each table is one parquet file under the sf dir. */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
