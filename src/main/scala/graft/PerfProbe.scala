package graft

import org.apache.spark.sql.functions._

/** Scratch timing probe for hot-path decomposition (dev tool, not part
  * of the driver contract). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.t(spark, dir, "documents")
    time("read_only") {
      docs.select(col("doc_id"), col("text"))
        .write.mode("overwrite").format("noop").save()
    }
    val events = Tables.t(spark, dir, "events")
    time("events_scan") {
      events.write.mode("overwrite").format("noop").save()
    }
    time("events_get_json") {
      events.withColumn("k",
        get_json_object(col("props"), "$.k").cast("int"))
        .write.mode("overwrite").format("noop").save()
    }
    time("events_from_json") {
      events.withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType))))
          .getField("k"))
        .write.mode("overwrite").format("noop").save()
    }
    time("cloudtrail_view") {
      graft.sources.CloudTrail.fromEvents(events)
        .write.mode("overwrite").format("noop").save()
    }
    time("audit_pack_full") {
      SparkEntry.queries("q_pack_aws_audit_log_changes")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    val sh = Dedup.shingles(spark, dir)
    time("shingles_explode") {
      sh.write.mode("overwrite").format("noop").save()
    }
    time("shingles_md5") {
      sh.withColumn("h", graft.functions.hashes.md5(col("sh")))
        .write.mode("overwrite").format("noop").save()
    }
    time("shingles_md5_builtin") {
      sh.withColumn("h", md5(col("sh")))
        .write.mode("overwrite").format("noop").save()
    }
    time("groupBy_1min") {
      sh.withColumn("h", graft.functions.hashes.md5(col("sh")))
        .groupBy(col("doc_id"))
        .agg(min(substring(col("h"), 1, 4)))
        .write.mode("overwrite").format("noop").save()
    }
    time("full_minhash") {
      Dedup.minhashSignatures(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time("qs_full") {
      TextOps.qualityScore(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time("qs_no_regex") {
      docs.withColumn("w", split(col("text"), " "))
        .withColumn("n_tok", size(col("w")).cast("long"))
        .withColumn("n_stop", size(expr(
          "filter(w, x -> x IN ('the', 'a', 'of', 'and'))")).cast("long"))
        .select(col("doc_id"), col("n_tok"), col("n_stop"))
        .write.mode("overwrite").format("noop").save()
    }
    time("qs_regex_only") {
      docs.withColumn("n_digit",
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
        .select(col("doc_id"), col("n_digit"))
        .write.mode("overwrite").format("noop").save()
    }
    time("fingerprint_explode") {
      TextOps.fingerprint(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    time("fingerprint_hof") {
      docs.filter(length(col("text")) >= 5)
        .select(col("doc_id"), array_min(
          transform(
            sequence(lit(1), length(col("text")) - 4),
            i => graft.functions.hashes.md5(col("text").substr(i, lit(5)))))
          .as("fingerprint"))
        .orderBy(col("doc_id"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
