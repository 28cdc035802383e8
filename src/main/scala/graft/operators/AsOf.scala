package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General as-of join — for each left row, the single most recent right
  * row with equal keys and rightTime <= leftTime, no older than
  * `toleranceS`. Spark has no native ASOF operator (DuckDB/Pandas do),
  * and the naive formulations both fail at scale: a per-key window over
  * the unioned timelines sorts every key's full history, and a raw
  * range join explodes to |left|x|right| per key before filtering.
  *
  * This is the bucket-keyed shape proven by the anchored-correlation
  * join (engine/RuleEngine.anchoredParents): both sides bucket time by
  * the tolerance width, the left side duplicates into its own and the
  * previous bucket (a right match within tolerance can only live
  * there), and the join is a plain multi-key EQUI-join — shuffles
  * partition on (keys, bucket), candidates are bounded per bucket, and
  * a max_by argmax picks the match without any window sort. The left
  * frame is consumed exactly ONCE (LEFT OUTER candidate join, then the
  * argmax collapses the bucket duplicates), so the left scan is not
  * paid twice. AQE handles residual bucket skew.
  */
object AsOf {

  /** @param keys       equality key columns present on both sides
    * @param leftId     unique left row id (the argmax grouping key)
    * @param leftTimeS  left epoch-seconds column
    * @param rightId    unique right row id (deterministic tie-break)
    * @param rightTimeS right epoch-seconds column
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
      toleranceS: Long): DataFrame = {
    require(toleranceS > 0, s"toleranceS must be positive, got $toleranceS")
    val rCols = right.columns.filterNot(keys.contains).toSeq
    val generated =
      Seq("__lbk", "__rbk", "__m") ++ rCols.map("r_" + _) ++
        keys.map("__rk_" + _)
    val collisions = left.columns.toSet.intersect(generated.toSet)
    require(collisions.isEmpty,
      s"left columns collide with asofJoin-generated names: " +
        s"${collisions.mkString(", ")} — rename them first " +
        "(e.g. when chaining as-of joins, alias the previous r_* output)")
    val r = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        rCols.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__rbk", floor(col(s"r_$rightTimeS") / toleranceS))
    val lt = col(leftTimeS)
    val rt = col(s"r_$rightTimeS")
    val leftCols = left.columns.toSeq
    val aggs =
      leftCols.filterNot(_ == leftId).map(c => first(col(c)).as(c)) :+
        max_by(struct(rCols.map(c => col(s"r_$c")): _*),
          struct(rt, col(s"r_$rightId"))).as("__m")
    // LEFT OUTER so unmatched left rows survive; the groupBy collapses
    // the two bucket copies of each left row, max_by ignores null-keyed
    // rows, and first() re-emits the (identical) left values — left's
    // lineage is evaluated exactly once.
    left
      .withColumn("__lbk",
        explode(array(floor(lt / toleranceS), floor(lt / toleranceS) - 1)))
      .join(r, keys.map(k => col(k) === col(s"__rk_$k"))
        .foldLeft(col("__lbk") === col("__rbk"))(_ && _) &&
        rt <= lt && lt - rt <= toleranceS, "left")
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
      .select(leftCols.map(col) ++
        rCols.map(c => col(s"__m.r_$c").as(s"r_$c")): _*)
  }
}
