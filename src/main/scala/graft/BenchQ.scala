object BenchQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.SparkEntry.queries("q_agg_pushdown")(spark, dir).write.mode("overwrite").format("noop").save()
    for (q <- args) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
