package graft

import org.apache.spark.sql.Column

/** The corpus-wide word-4-gram contract, in ONE place: every operator
  * that keys on overlapping word windows (decontamination, span dedup,
  * source overlap, gram novelty) derives its keys from this expression,
  * so the gram definition — window width, separator, per-row dedup —
  * cannot drift between operators (each has a DuckDB oracle stating the
  * same contract).
  *
  * Grams are DEDUPED row-locally before any explode: (row, gram) is
  * then unique by construction, so downstream aggregates are plain
  * counts — no distinct-aggregate expand — and the exploded row count
  * shrinks by the intra-row repetition factor before it ever hits a
  * shuffle. The whole build-hash-dedup pass is one fused kernel
  * (functions.DistinctWordGramHashes); the declarative
  * array_distinct(transform(sequence(...))) chain it replaced ran as an
  * interpreted CodegenFallback — 4-6× slower at sf~1.
  *
  * `hashFn` picks the key representation: "xxhash64" (8-byte longs —
  * 4× narrower exchanges; use whenever the key itself never reaches the
  * output, since counts are invariant under any injective mapping) or
  * "md5" (32-hex strings — use when the key must match a cross-engine
  * oracle bit-for-bit, e.g. the decontamination broadcast set).
  */
object Grams {

  /** Distinct hashed word-4-grams of the text column, as a row-local
    * array (null below 4 words — callers filter). */
  def distinctWordGrams(text: Column, hashFn: String): Column =
    graft.functions.hashes.distinctWordGramHashes(text, 4, hashFn)
}
