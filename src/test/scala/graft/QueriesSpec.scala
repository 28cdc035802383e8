package graft

/** Every SparkEntry query runs at sf0.001 and returns a sane shape.
  * (Value-level correctness is the driver's DuckDB gate; tools/check.py
  * replays it locally.)
  */
class QueriesSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // Queries where 0 rows is legitimate at this tiny scale factor.
  // q_pack_sf_ip_login_fails keeps the reference's `counts > 5`
  // threshold, which ~33 events/day at sf0.001 cannot reach (it fires
  // at the sf0.01 correctness scale).
  private val mayBeEmpty = Set("q_dedup_exact", "q_embedding_neardup",
    "q_dedup_lsh_pairs", "q_pack_sf_ip_login_fails",
    // 10-credit spend thresholds can't bind on sf0.001's ~dozen-event
    // windows; they're calibrated to be non-trivial at the sf0.01 gate
    "q_pack_cost_clustering_spend", "q_pack_cost_mv_spend",
    "q_pack_cost_pipe_spend")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, Sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q_agg_pushdown groups are the 6 (flag, status) combos") {
    assert(SparkEntry.queries("q_agg_pushdown")(spark, Sf).count() == 6)
  }

  test("q_alert_merge counters sum to alert count") {
    import org.apache.spark.sql.functions._
    val alerts = SparkEntry.queries("q_alert_rule")(spark, Sf).count()
    val merged = SparkEntry.queries("q_alert_merge")(spark, Sf)
      .agg(sum("counter")).head.getLong(0)
    assert(merged == alerts)
  }

  test("q_ann_bruteforce returns descending cosine top-k") {
    val cos = SparkEntry.queries("q_ann_bruteforce")(spark, Sf)
      .collect().map(_.getAs[Double]("cosine"))
    assert(cos.length == 10)
    assert(cos.sameElements(cos.sorted.reverse))
  }

  test("q_dedup_lsh_pairs jaccard values are all >= 0.5") {
    val rows = SparkEntry.queries("q_dedup_lsh_pairs")(spark, Sf).collect()
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
  }
}
