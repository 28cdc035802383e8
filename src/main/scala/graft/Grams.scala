package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The corpus-wide word-4-gram contract, in ONE place: every operator
  * that keys on overlapping word windows (decontamination, span dedup,
  * source overlap, gram novelty) derives its keys from this expression,
  * so the gram definition — window width, separator, per-row dedup —
  * cannot drift between operators (each has a DuckDB oracle stating the
  * same contract).
  *
  * Grams are DEDUPED row-locally (array_distinct inside the projection)
  * before any explode: (row, gram) is then unique by construction, so
  * downstream aggregates are plain counts — no distinct-aggregate
  * expand — and the exploded row count shrinks by the intra-row
  * repetition factor before it ever hits a shuffle.
  *
  * `hashFn` picks the key representation: "xxhash64" (8-byte longs —
  * 4× narrower exchanges; use whenever the key itself never reaches the
  * output, since counts are invariant under any injective mapping) or
  * "md5" (32-hex strings — use when the key must match a cross-engine
  * oracle bit-for-bit, e.g. the decontamination broadcast set).
  */
object Grams {

  /** Distinct hashed word-4-grams of the array<string> column named
    * `w`, as a row-local array. */
  def distinctWordGrams(w: String, hashFn: String): Column = {
    require(hashFn == "md5" || hashFn == "xxhash64",
      s"unsupported gram hash $hashFn")
    expr(
      s"""array_distinct(transform(sequence(1, size($w)-3),
         |  i -> $hashFn(concat_ws(' ',
         |    element_at($w,i), element_at($w,i+1),
         |    element_at($w,i+2), element_at($w,i+3)))))""".stripMargin)
  }
}
