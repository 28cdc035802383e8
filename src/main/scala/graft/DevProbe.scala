package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a named query against an sf dir with a noop write and
  * print wall time plus the executed (post-AQE) plan — the companion to
  * ExplainQ (which shows the pre-execution plan) for plan audits where
  * runtime re-planning (broadcast conversion, coalescing) matters. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    for (q <- args.take(1)) {
      val df = SparkEntry.queries(q)(spark, dir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df.explain("formatted")
    }
    spark.stop()
  }
}
