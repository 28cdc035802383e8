package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Range (point-in-interval) join: the discretized equi-join must equal
  * the naive theta-join row-for-row and must never plan a nested loop.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:30:00")), (2L, ts("2024-01-03 00:00:00")),
    (3L, ts("2024-01-08 23:59:59")), (4L, ts("2024-02-01 12:00:00")),
    (5L, ts("2024-01-05 07:00:00"))).toDF("p_id", "t")
  private lazy val intervals = Seq(
    (10L, ts("2024-01-01 00:00:00")), (11L, ts("2024-01-02 18:00:00")),
    (12L, ts("2024-01-07 01:00:00")), (13L, ts("2023-12-30 00:00:00")))
    .toDF("i_id", "start")

  test("pointInInterval equals the exact theta join (sub-grain starts)") {
    // intervals here start mid-day on purpose: containment is exact
    // on the RAW timestamps, not on day-truncated ones
    val got = RangeJoin
      .pointInInterval(points, "t", intervals, "start", len = 7)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val naive = points.join(intervals,
        col("start") <= col("t") &&
          col("t") < col("start") + expr("interval 7 days"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(naive.nonEmpty && got.sameElements(naive))
  }

  test("containingCount matches the pair variant on aligned intervals") {
    // containingCount's contract is grain-aligned: feed it (and the
    // pair variant) day-truncated starts and the counts must agree
    val aligned = intervals
      .select(col("i_id"), date_trunc("DAY", col("start")).as("start"))
    val counts = RangeJoin
      .containingCount(points, "t", aligned, "start", len = 7)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val pairs = RangeJoin
      .pointInInterval(points, "t", aligned, "start", len = 7)
      .groupBy(date_trunc("DAY", col("t")).as("b")).count()
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(counts == pairs)
  }

  test("randomized pinning: discretized equals theta join over random data") {
    val rnd = new scala.util.Random(1337)
    val base = ts("2024-03-01 00:00:00").getTime
    def randTs() = new java.sql.Timestamp(
      base + rnd.nextInt(40 * 24 * 3600) * 1000L)
    for (round <- 1 to 3) {
      val ps = Seq.tabulate(120)(i => (i.toLong, randTs()))
        .toDF("p_id", "t")
      val ivs = Seq.tabulate(40)(i => (i.toLong, randTs()))
        .toDF("i_id", "start")
      val len = 1 + rnd.nextInt(9)
      val got = RangeJoin.pointInInterval(ps, "t", ivs, "start", len)
        .select("p_id", "i_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val naive = ps.join(ivs,
          col("start") <= col("t") &&
            col("t") < col("start") + expr(s"interval $len days"))
        .select("p_id", "i_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(naive), s"round $round len $len diverged")
    }
  }

  test("randomized pinning: salted join equals plain join over random data") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val fat = Seq.tabulate(400)(i =>
        (rnd.nextInt(5).toLong, rnd.nextLong())).toDF("k", "payload")
      val slim = Seq.tabulate(8)(i =>
        (i.toLong % 6, s"tag$i")).toDF("k", "tag")
      val salts = 1 + rnd.nextInt(15)
      val got = graft.operators.SaltedJoin
        .inner(fat, slim, Seq("k"), salts)
        .select("k", "payload", "tag").collect()
        .map(_.toSeq.toString).sorted
      val plain = fat.join(slim, Seq("k"))
        .select("k", "payload", "tag").collect()
        .map(_.toSeq.toString).sorted
      assert(got.sameElements(plain), s"round $round salts $salts diverged")
    }
  }

  test("the discretized plan is an equi-join, never a nested loop") {
    val plan = SparkEntry.queries("q_range_join")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range join planned a nested loop")
    assert(!plan.contains("CartesianProduct"))
  }
}
