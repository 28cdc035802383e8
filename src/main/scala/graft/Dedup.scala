package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Dedup {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
