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
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "128m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q_summary_stats", "q_mix_temperature", "q_corpus_sample",
      "q_leakage_split", "q_semi_anti_join", "q_multimodal_meta",
      "q_pack_azure_cis_storage_https", "q_pack_cis_1_14_root_hw_mfa",
      "q_baseline_percentiles", "q_closeout_date", "q_topk_window",
      "q_login_baseline")

    // job/stage/task census + summed in-job wall time per exec
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(j.jobId, j.time)
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(j.jobId)
          if (s != 0L) jobMs.addAndGet(j.time - s)
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })

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
      Thread.sleep(150)
      jobs.set(0); stages.set(0); tasks.set(0); jobMs.set(0)
      val (c, p, e) = once(q)
      Thread.sleep(150)
      sc += c; sp += p; se += e
      println(f"$q%-34s construct=$c%5.3f plan=$p%5.3f exec=$e%5.3f " +
        f"jobs=${jobs.get}%2d stages=${stages.get}%2d tasks=${tasks.get}%3d inJob=${jobMs.get / 1000.0}%5.3f")
    }
    println(f"TOTAL over ${qs.size} queries: construct=$sc%5.2f plan=$sp%5.2f exec=$se%5.2f")
    spark.stop()
  }
}
