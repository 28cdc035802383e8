package graft

/** Dev probe: decompose the per-query floor of representative
  * floor-bound bench queries into (construct, plan, execute) — where
  * does the ~0.2 s go when DuckDB does ~10 ms of work? Not part of the
  * driver contract.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q_summary_stats", "q_mix_temperature", "q_corpus_sample",
      "q_leakage_split", "q_semi_anti_join", "q_multimodal_meta",
      "q_pack_azure_cis_storage_https", "q_pack_cis_1_14_root_hw_mfa",
      "q_baseline_percentiles", "q_closeout_date", "q_topk_window",
      "q_login_baseline")

    def once(name: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimize+physical
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    // warm
    once("q_agg_pushdown"); once("q_agg_pushdown")
    var (sc, sp, se) = (0.0, 0.0, 0.0)
    for (q <- qs) {
      once(q) // warm codegen for this query
      val (c, p, e) = once(q)
      sc += c; sp += p; se += e
      println(f"$q%-34s construct=$c%5.3f plan=$p%5.3f exec=$e%5.3f")
    }
    println(f"TOTAL over ${qs.size} queries: construct=$sc%5.2f plan=$sp%5.2f exec=$se%5.2f")
    spark.stop()
  }
}
