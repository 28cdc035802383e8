package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object Engine {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
