package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General as-of join — for each left row, the single most recent right
  * row with equal keys and rightTime <= leftTime, no older than
  * `toleranceS`. Spark has no native ASOF operator (DuckDB/Pandas do),
  * and the naive formulations both fail at scale: a per-key window over
  * the unioned timelines sorts every key's full history, and a raw
  * range join explodes to |left|x|right| per key before filtering.
  *
  * This is the bucket-keyed shape proven by the anchored-correlation
  * join (engine/RuleEngine.anchoredParents): both sides bucket time by
  * the tolerance width and the join is a plain multi-key EQUI-join —
  * shuffles partition on (keys, bucket), candidates are bounded per
  * bucket, and an argmax aggregate picks the match without any window
  * sort. Two plan-shape choices are deliberate:
  *
  *  - the RIGHT side duplicates into its own and the NEXT bucket (a
  *    right row at rt can only serve left rows in bucket(rt) or
  *    bucket(rt)+1), so each left row enters the join ONCE — the
  *    argmax input is |left| + |candidates| rows, not 2x|left|;
  *  - the argmax ordering (rightTime, rightId) is PACKED into one
  *    DECIMAL(38,0) — (rt + 2^62)*2^63 + (rid + 2^62), order-isomorphic
  *    to the (rt, rid) lexicographic pair for |values| < 2^62 — and
  *    each matched column rides its own max_by against that key.
  *    max_by/first over fixed-width buffers plan as HashAggregate
  *    (map-side combined, plan-verified); the struct-keyed max_by this
  *    replaces forced a SortAggregate — two extra full sorts of every
  *    candidate row. At 10x events the two shapes measure within noise
  *    (~1.3 s, candidates are sparse there); the sort cost scales with
  *    the candidate count, which is exactly what grows with key skew
  *    and tolerance width. The key is unique per candidate (rid is
  *    unique), so the per-column argmaxes cannot tear across rows.
  *
  * AQE handles residual bucket skew.
  */
object AsOf {

  private val Two62 = BigDecimal(BigInt(1) << 62)
  private val Two63 = BigDecimal(BigInt(1) << 63)

  /** (rt, rid) lexicographic order as one fixed-width decimal; null iff
    * rt/rid are null (unmatched left rows — max_by then ignores them). */
  private def packedKey(rt: Column, rid: Column): Column =
    (rt.cast(DecimalType(38, 0)) + lit(Two62)) * lit(Two63) +
      (rid.cast(DecimalType(38, 0)) + lit(Two62))

  /** @param keys       equality key columns present on both sides
    * @param leftId     unique left row id (the argmax grouping key)
    * @param leftTimeS  left epoch-seconds column
    * @param rightId    unique right row id (deterministic tie-break)
    * @param rightTimeS right epoch-seconds column
    * @param direction  "backward" (default): most recent right row at
    *                   or before leftTime; "forward": earliest right
    *                   row at or after leftTime — the two directions a
    *                   full ASOF surface offers (e.g. joining an event
    *                   to the NEXT config snapshot instead of the
    *                   previous one). Forward mirrors every plan
    *                   choice: the right side duplicates into its own
    *                   and the PREVIOUS bucket, and the argmax flips
    *                   to a min_by over the same packed key.
    * @param buildSide  which side the shuffled hash join builds its
    *                   hash table from. "right" (default) suits the
    *                   common asof shape — a big probe stream against
    *                   a smaller reference timeline. Pass "left" when
    *                   the LEFT side is the rare one (e.g. a filtered
    *                   alert stream as-of-joined to a dense activity
    *                   table): the build table then holds the small
    *                   side instead of the 2x-duplicated dense side
    *                   (Spark 3.5+ supports LeftOuter with BuildLeft;
    *                   parity and the plan are spec-pinned).
    * @return left rows + matched right columns prefixed `r_` (null
    *         where no right row matches — LEFT ASOF semantics) */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTimeS: String,
      rightId: String,
      rightTimeS: String,
      toleranceS: Long,
      direction: String = "backward",
      buildSide: String = "right"): DataFrame = {
    require(toleranceS > 0, s"toleranceS must be positive, got $toleranceS")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(buildSide == "left" || buildSide == "right",
      s"buildSide must be left|right, got $buildSide")
    val fwd = direction == "forward"
    val rCols = right.columns.filterNot(keys.contains).toSeq
    val generated =
      Seq("__lbk", "__rbk") ++ rCols.map("r_" + _) ++ keys.map("__rk_" + _)
    val collisions = left.columns.toSet.intersect(generated.toSet)
    require(collisions.isEmpty,
      s"left columns collide with asofJoin-generated names: " +
        s"${collisions.mkString(", ")} — rename them first " +
        "(e.g. when chaining as-of joins, alias the previous r_* output)")
    // shuffle_hash, build = right: the join output is immediately
    // re-shuffled by leftId for the argmax, so the SMJ's two full
    // (keys, bucket) sorts buy nothing downstream — and the hash build
    // is the per-(key, bucket) candidate set, exactly the quantity the
    // bucketing scheme already bounds (AQE still splits residual skew).
    // Measured 0.82-1.01 -> 0.60 s steady-state at 10x events, exact
    // parity both directions.
    val rRaw = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        rCols.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__rbk", explode(array(
        floor(col(s"r_$rightTimeS") / toleranceS),
        floor(col(s"r_$rightTimeS") / toleranceS) +
          (if (fwd) -1 else 1))))
    val r = if (buildSide == "right") rRaw.hint("shuffle_hash") else rRaw
    val lt = col(leftTimeS)
    val rt = col(s"r_$rightTimeS")
    val leftCols = left.columns.toSeq
    val key = packedKey(rt, col(s"r_$rightId"))
    // The argmax groups by (__lbk, keys, leftId), not leftId alone —
    // same groups (leftId is unique and determines the others), but
    // the join's output is already hash-partitioned by (__lbk, keys),
    // which satisfies the wider clustering, so the aggregate runs IN
    // the join's partitions: the |left| + |candidates| re-shuffle the
    // leftId-only grouping forced is elided entirely (plan-pinned).
    val groupCols = (Seq("__lbk") ++ keys :+ leftId).map(col)
    val aggs =
      leftCols.filterNot(c => c == leftId || keys.contains(c))
        .map(c => first(col(c)).as(c)) ++
        rCols.map(c => (if (fwd) min_by(col(s"r_$c"), key)
          else max_by(col(s"r_$c"), key)).as(s"r_$c"))
    val timePred =
      if (fwd) rt >= lt && rt - lt <= toleranceS
      else rt <= lt && lt - rt <= toleranceS
    // LEFT OUTER so unmatched left rows survive (their r_* stay null:
    // max_by/min_by ignore null keys); first() re-emits the left
    // values — left's lineage is evaluated exactly once, never
    // duplicated.
    val lPre = left.withColumn("__lbk", floor(lt / toleranceS))
    val l = if (buildSide == "left") lPre.hint("shuffle_hash") else lPre
    l.join(r, keys.map(k => col(k) === col(s"__rk_$k"))
        .foldLeft(col("__lbk") === col("__rbk"))(_ && _) &&
        timePred, "left")
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(leftCols.map(col) ++ rCols.map(c => col(s"r_$c")): _*)
  }
}
