package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** The general as-of join operator (operators/AsOf.scala): bucket-keyed
  * equi-join shape, LEFT ASOF semantics. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def frame(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("id", "k", "t")

  test("picks the most recent right row within tolerance, null beyond") {
    val left = frame((1L, "a", 100L), (2L, "a", 5000L), (3L, "b", 100L))
    val right = frame((10L, "a", 40L), (11L, "a", 90L), (12L, "b", 3000L))
    val got = AsOf.asofJoin(left, right, Seq("k"),
        "id", "t", "id", "t", 1000L)
      .select(col("id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(11L)) // most recent of 40, 90
    assert(got(2L).isEmpty)       // 90 is 4910s stale: beyond tolerance
    assert(got(3L).isEmpty)       // b's only right row is in the future
  }

  test("matches across the bucket boundary") {
    // left t=1010 (bucket 1), right t=990 (bucket 0), within 1000s
    val got = AsOf.asofJoin(
        frame((1L, "a", 1010L)), frame((9L, "a", 990L)),
        Seq("k"), "id", "t", "id", "t", 1000L)
      .select(col("r_id")).head
    assert(got.getLong(0) == 9L)
  }

  test("randomized: matches a brute-force as-of scan") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val lrows = (0 until 25).map(i =>
        (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
      val rrows = (0 until 25).map(i =>
        (100L + i, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
      val tol = 700L
      val expected = lrows.map { case (lid, lk, lt) =>
        val cands = rrows.filter { case (_, rk, rt) =>
          rk == lk && rt <= lt && lt - rt <= tol
        }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1))
      }.toMap
      val got = AsOf.asofJoin(frame(lrows: _*), frame(rrows: _*),
          Seq("k"), "id", "t", "id", "t", tol)
        .select(col("id"), col("r_id")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("forward direction picks the earliest right row at-or-after") {
    val left = frame((1L, "a", 100L), (2L, "a", 5000L), (3L, "b", 100L))
    val right = frame((10L, "a", 140L), (11L, "a", 190L), (12L, "b", 3000L))
    val got = AsOf.asofJoin(left, right, Seq("k"),
        "id", "t", "id", "t", 1000L, direction = "forward")
      .select(col("id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(10L)) // earliest of 140, 190
    assert(got(2L).isEmpty)       // nothing at-or-after 5000 within tol
    assert(got(3L).isEmpty)       // b's row is 2900s ahead: beyond tol
  }

  test("randomized: forward matches a brute-force next-match scan") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val lrows = (0 until 25).map(i =>
        (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
      val rrows = (0 until 25).map(i =>
        (100L + i, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
      val tol = 700L
      val expected = lrows.map { case (lid, lk, lt) =>
        val cands = rrows.filter { case (_, rk, rt) =>
          rk == lk && rt >= lt && rt - lt <= tol
        }
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy { case (rid, _, rt) => (rt, rid) }._1))
      }.toMap
      val got = AsOf.asofJoin(frame(lrows: _*), frame(rrows: _*),
          Seq("k"), "id", "t", "id", "t", tol, direction = "forward")
        .select(col("id"), col("r_id")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("buildSide=left: result-identical and the join builds left") {
    val rnd = new scala.util.Random(23)
    val lrows = (0 until 25).map(i =>
      (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
    val rrows = (0 until 40).map(i =>
      (100L + i, s"k${rnd.nextInt(3)}", rnd.nextInt(5000).toLong))
    def run(b: String) = AsOf.asofJoin(frame(lrows: _*), frame(rrows: _*),
        Seq("k"), "id", "t", "id", "t", 700L, buildSide = b)
      .orderBy(col("id")).collect().map(_.toString).toSeq
    assert(run("left") == run("right"))
    val plan = AsOf.asofJoin(frame(lrows: _*), frame(rrows: _*),
        Seq("k"), "id", "t", "id", "t", 700L, buildSide = "left")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BuildLeft"),
      s"buildSide=left did not build left:\n$plan")
    val ex = intercept[IllegalArgumentException] {
      AsOf.asofJoin(frame(lrows: _*), frame(rrows: _*),
        Seq("k"), "id", "t", "id", "t", 700L, buildSide = "middle")
    }
    assert(ex.getMessage.contains("buildSide"))
  }

  test("plans as an equi-join keyed by the time bucket") {
    val plan = AsOf.asofJoin(
        frame((1L, "a", 10L)), frame((2L, "a", 5L)),
        Seq("k"), "id", "t", "id", "t", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__lbk") && plan.contains("__rbk"),
      s"as-of join lost its bucket keys:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
