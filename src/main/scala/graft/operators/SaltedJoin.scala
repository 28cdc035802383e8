package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join for the hot-key shape AQE's skew handling does
  * not reach: a SHUFFLE join where one side is too big to broadcast and
  * a handful of join-key values carry a disproportionate share of the
  * rows (a single C2 domain across 100 TB of proxy logs, one service
  * account behind half the CloudTrail events). A plain shuffle join
  * sends every row of a hot key to ONE reducer; the straggler task then
  * bounds the whole stage. (AQE's skew-join split only rescues *sort-
  * merge* partitions; it cannot split a key that hashes whole to one
  * task on the build side of a shuffled-hash join, and it does nothing
  * when the skew is in the JOIN KEY multiplicity itself.)
  *
  * The classic fix, expressed declaratively: append a salt in [0, S)
  * to the key on the fat side — derived from xxhash64 of the whole row,
  * so it is DETERMINISTIC (retried tasks and re-runs salt identically,
  * unlike rand()) — and explode the slim side S-fold so every
  * (key, salt) pair still meets its match. Each hot key now spreads
  * over S reducers; the slim side pays an S-fold duplication it can
  * afford by hypothesis. Row multiplicity of the join is unchanged,
  * proven in SaltedJoinSpec against the plain join.
  *
  * `fat`'s non-key columns feed the salt; rows identical across ALL
  * columns salt identically (and thus still co-locate — acceptable:
  * fully duplicate rows are indistinguishable, spreading them needs a
  * physical-position source like spark_partition_id, which would break
  * determinism across repartitions).
  */
object SaltedJoin {

  /** Inner equi-join of `fat` ⋈ `slim` on `keys`, with `fat`'s rows
    * spread across `salts` sub-keys. Result column set = fat ++ slim
    * non-key columns, exactly as `fat.join(slim, keys)`. */
  def inner(fat: DataFrame, slim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!fat.columns.contains("__salt") && !slim.columns.contains("__salt"),
      "__salt is reserved by SaltedJoin")
    val saltCol: Column =
      pmod(xxhash64(fat.columns.map(col).toIndexedSeq: _*), lit(salts))
    val fatS = fat.withColumn("__salt", saltCol)
    val slimS = slim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    fatS.join(slimS, keys :+ "__salt").drop("__salt")
  }
}
