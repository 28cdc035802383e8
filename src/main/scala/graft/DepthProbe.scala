package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: depth distribution of the anchored-correlation parent
  * forest at a given SF dir. Not part of the engine surface. */
object DepthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = SparkEntry.queries("q_alert_rule")(spark, dir)
    val parents =
      graft.engine.RuleEngine.anchoredParents(a, 60, 10000).cache()
    val n = parents.count()
    var lab = parents.select(col("a_id"), col("parent_id")).cache()
    var d = 1
    var more = true
    while (more && d < 64) {
      val next = lab
        .join(parents.select(col("a_id").as("parent_id"),
          col("parent_id").as("gp")), Seq("parent_id"))
        .select(col("a_id"), col("gp").as("parent_id")).cache()
      val c = next.count()
      println(s"PROBE depth>=${d + 1}: $c nodes")
      if (c == 0) more = false else { lab = next; d += 1 }
    }
    println(s"PROBE parents=$n maxDepth=$d")
    spark.stop()
  }
}
