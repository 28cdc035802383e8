package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB replacements for
  * exact distinct counts and exact percentiles. Both are built-in
  * codegen'd aggregates (HyperLogLog++ behind approx_count_distinct,
  * KLL-style quantile summaries behind approx_percentile); these specs
  * pin the error contracts the scale design in SURVEY §5 relies on,
  * so an upgrade that degrades either sketch fails loudly.
  */
class SketchSpec extends SparkSuite {

  test("HLL distinct counts stay within the configured rsd per group") {
    val docs = Tables.t(spark, Sf, "documents")
    val rsd = 0.05
    val rows = docs
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("exact"),
        approx_count_distinct(col("doc_id"), rsd).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // 4x rsd ≈ 4 sigma — a deterministic bound for a fixed dataset
      assert(math.abs(approx - exact) <= math.max(1.0, 4 * rsd * exact),
        s"source ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("HLL merges distributively: union of groups == regrouped whole") {
    // the property that lets partial sketches merge across executors:
    // computing over the union equals computing over pre-merged halves
    val docs = Tables.t(spark, Sf, "documents")
    val whole = docs.agg(approx_count_distinct(col("doc_id"), 0.05))
      .collect().head.getLong(0)
    val halves = docs
      .withColumn("half", col("doc_id") % 2)
      .groupBy(col("half")).agg(approx_count_distinct(col("doc_id"), 0.05))
    // HLL(union) <= sum of per-half HLLs, and >= each half
    val hv = halves.collect().map(_.getLong(1))
    assert(whole <= hv.sum * 1.05)
    assert(whole >= hv.max * 0.95)
  }

  test("approx percentiles bracket the exact percentiles on lineitem") {
    val li = Tables.t(spark, Sf, "lineitem")
      .select(col("l_extendedprice").cast("double").as("x"))
    val exact = li.agg(
      expr("percentile(x, array(0.5, 0.95, 0.99))")).collect()
      .head.getSeq[Double](0)
    val approx = li.agg(
      expr("approx_percentile(x, array(0.5, 0.95, 0.99), 1000)")).collect()
      .head.getSeq[Double](0)
    // accuracy parameter 1000 → rank error <= n/1000; translate to a
    // loose value-space check: approx within the exact p±2% band
    val lo = li.agg(expr("percentile(x, array(0.48, 0.93, 0.97))"))
      .collect().head.getSeq[Double](0)
    val hi = li.agg(expr("percentile(x, array(0.52, 0.97, 1.0))"))
      .collect().head.getSeq[Double](0)
    for (i <- exact.indices) {
      assert(approx(i) >= lo(i) && approx(i) <= hi(i),
        s"p${Seq(50, 95, 99)(i)}: approx ${approx(i)} outside " +
          s"[${lo(i)}, ${hi(i)}] around exact ${exact(i)}")
    }
  }
}
