package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Membership pre-filter for INCREMENTAL dedup: "is this incoming
  * document's content hash already in the historical corpus?" asked
  * without joining the increment against 100 TB of history.
  *
  * The exact answer is a left-anti join — correct, but it re-shuffles
  * the entire historical hash set every landing cycle to reject a
  * daily increment that is mostly novel. The scale shape is a Bloom
  * filter built ONCE over history (a distributed treeAggregate inside
  * `DataFrameStatFunctions.bloomFilter` — executors build partial
  * filters, OR-merge up; history never concentrates anywhere), shipped
  * to executors as a broadcast of size O(bits), and applied as a
  * per-row probe in the increment's scan:
  *
  *   - a NEGATIVE probe is definitive (Bloom filters have no false
  *     negatives): the doc is certainly new, admit it with zero joins;
  *   - a POSITIVE probe (rate ε, tunable) falls back to the exact
  *     anti-join — but now the join's left side is |increment| · ε
  *     rows, not |increment|.
  *
  * `gate` composed with the exact fallback equals the plain anti-join
  * row-for-row (ScaleOpsSpec). The probe is a native codegen'd
  * expression ([[graft.functions.BloomMightContain]] — Spark exposes
  * no public might_contain Column function): it runs per-row inside
  * the scan's fused consume path with no shuffle, the sketch shipping
  * once per executor as a plan reference object.
  */
object BloomDedupGate {

  /** Build the history-side filter over `col` (long hashes; use
    * xxhash64(content) upstream). `expected`/`fpp` size the sketch:
    * bits ≈ -n·ln(ε)/ln²2 — 1 G hashes at ε=0.01 is ~1.2 GB, a
    * broadcast a 1000-executor cluster ships once per cycle. */
  def build(history: DataFrame, col: String, expected: Long,
      fpp: Double): BloomFilter =
    history.stat.bloomFilter(col, expected, fpp)

  /** Split `incoming` by the probe: (certainly-new, needs-exact-check).
    * Probe runs on executors against the auto-broadcast `bf` (task
    * closures serialize it once per executor, not per row). */
  def gate(incoming: DataFrame, hashCol: String, bf: BloomFilter)
      : (DataFrame, DataFrame) = {
    require(!incoming.columns.contains("__maybe"),
      "__maybe is reserved by BloomDedupGate")
    // a NULL hash never matches an anti-join key, so the exact pass
    // would keep the row — route nulls to the candidate side (the
    // null-intolerant probe yields null for null input; coalesce to
    // true) so the fallback anti-join preserves that semantic instead
    // of the row vanishing from both splits
    val flagged = incoming.withColumn("__maybe",
      coalesce(graft.functions.bloom.mightContain(col(hashCol), bf),
        lit(true)))
    (flagged.filter(!col("__maybe")).drop("__maybe"),
      flagged.filter(col("__maybe")).drop("__maybe"))
  }

  /** The composed incremental-dedup pass: everything in `incoming`
    * whose `hashCol` is NOT in `history` — Bloom fast-path for the
    * novel mass, exact anti-join only for the ε candidate sliver. */
  def novel(incoming: DataFrame, history: DataFrame, hashCol: String,
      bf: BloomFilter): DataFrame = {
    val (certain, candidates) = gate(incoming, hashCol, bf)
    certain.unionByName(
      candidates.join(history.select(col(hashCol)).distinct(),
        Seq(hashCol), "left_anti"))
  }
}
