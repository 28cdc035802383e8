package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without an equi-key — the shape
  * Spark's join selection can only plan as a BroadcastNestedLoopJoin
  * (every point row tested against every interval: O(P·I) compares,
  * and an outright CartesianProduct once the interval side outgrows
  * the broadcast threshold).
  *
  * The scalable idiom: DISCRETIZE. Each interval explodes into the
  * grain-aligned buckets it covers — a bounded expansion of
  * len(interval)/grain rows per interval, chosen so it is small — and
  * the range predicate becomes an EQUI-join on the bucket, which
  * shuffles/broadcasts like any other key join. Points test at most
  * one bucket; intervals pay their length once, at write side, where
  * map-side combine usually collapses them (the n-per-bucket
  * aggregation below never materializes the blowup at all). The same
  * trick keys the anchored-correlation self-join (RuleEngine) and the
  * as-of join (AsOf); this is the reusable point-in-interval face of
  * it.
  */
object RangeJoin {

  /** Count, per distinct grain-truncated point, the intervals
    * containing it: intervals pre-aggregate to (bucket, n) — the
    * interval stream never joins row-to-row with points at all.
    * GRAIN-ALIGNED contract: intervals are
    * [trunc(start), trunc(start) + len·grain) — a sub-grain start
    * offset is deliberately dropped, because per-bucket
    * pre-aggregation cannot carry a per-interval residual. For exact
    * arbitrary-start containment use [[pointInInterval]]. */
  def containingCount(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, len: Int,
      grain: String = "DAY"): DataFrame = {
    require(len > 0, s"interval length must be positive, got $len")
    val ptBucket = points
      .select(date_trunc(grain, col(pointCol)).as("bucket")).distinct()
    val step = grain.toLowerCase match {
      case "day" => expr("interval 1 day")
      case "hour" => expr("interval 1 hour")
      case g => throw new IllegalArgumentException(s"unsupported grain $g")
    }
    val cover = intervals
      .select(explode(sequence(
        date_trunc(grain, col(startCol)),
        date_trunc(grain, col(startCol)) +
          expr(s"interval ${len - 1} ${grain.toLowerCase}"),
        step)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_open"))
    ptBucket.join(cover, Seq("bucket"))
  }

  /** The general pairing variant: (point row, interval row) matches
    * under EXACT containment point ∈ [start, start + len·grain) with
    * arbitrary (sub-grain) starts — the classic discretize-then-refine:
    * intervals explode to the len+1 grain buckets a non-aligned
    * interval can touch, the range predicate becomes an equi-join on
    * the bucket, and the exact predicate re-applies as a cheap residual
    * filter on the matched pairs. Exact same rows a theta-join would
    * produce (randomized-pinned in RangeJoinSpec), never a nested-loop
    * plan. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, len: Int,
      grain: String = "DAY"): DataFrame = {
    require(!points.columns.contains("__bucket") &&
      !intervals.columns.contains("__bucket"),
      "__bucket is reserved by RangeJoin")
    // the post-join residual filter references startCol/pointCol by
    // name: if THOSE exist on both sides the references are ambiguous
    // (AnalysisException deep in the join) — fail early and clearly.
    // Other shared names are fine here and pass through duplicated in
    // the output, exactly like a plain df.join(other, key).
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
      .intersect(Set(pointCol, startCol))
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(", ")} exist on both sides — the " +
        "containment filter references them by name; alias one side")
    require(len > 0, s"interval length must be positive, got $len")
    val step = grain.toLowerCase match {
      case "day" => expr("interval 1 day")
      case "hour" => expr("interval 1 hour")
      case g => throw new IllegalArgumentException(s"unsupported grain $g")
    }
    val pts = points.withColumn("__bucket",
      date_trunc(grain, col(pointCol)))
    // len+1 buckets: an interval starting mid-bucket spills into the
    // bucket after trunc(start)+len·grain; the residual filter below
    // discards the overshoot
    val ivs = intervals.withColumn("__bucket", explode(sequence(
      date_trunc(grain, col(startCol)),
      date_trunc(grain, col(startCol)) +
        expr(s"interval $len ${grain.toLowerCase}"),
      step)))
    pts.join(ivs, Seq("__bucket"))
      .filter(col(startCol) <= col(pointCol) &&
        col(pointCol) < col(startCol) +
          expr(s"interval $len ${grain.toLowerCase}"))
      .drop("__bucket")
  }
}
