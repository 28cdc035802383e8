package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation RUN — the training-data analogue of the
  * alert side's Runner (rules → merge → suppress with observe()-based
  * metadata): quality gate → exact content dedup → per-source cap, with
  * the per-stage attrition census riding the ONE materializing action
  * as Dataset.observe metrics. A naive pipeline counts survivors with a
  * count() job per stage — four scans of a 100 TB corpus to learn four
  * numbers; here the counts are side-channel aggregates on the same
  * plan, so observability is free.
  *
  * Stage order matters at scale and is deliberate: the row-local
  * quality gate runs FIRST (cheapest, biggest cut, no shuffle), the
  * content-hash dedup window runs on survivors only, and the per-source
  * cap — the smallest output — runs last. Both windows key on hashes
  * (xxhash64 content key, md5-salted cap order), so the two shuffles
  * carry longs/short strings, never document text... except the text
  * column itself, which is dropped before the first shuffle: dedup
  * needs only the HASH of the text, so the 100 TB payload column dies
  * at the scan.
  */
object CorpusPipeline {
  import Tables.t

  /** Stage counts of one curation run. `capped` — the final output
    * count — is only known once the corpus frame has been materialized:
    * [[run]] fills it in; a census obtained from [[curate]]'s thunk
    * carries the NotCounted (-1) sentinel instead, because counting
    * there would force an extra aggregate node above the final sort. */
  final case class Census(
      ingested: Long, quality: Long, deduped: Long, capped: Long)

  /** Sentinel for [[Census.capped]] when the caller has not yet
    * counted the materialized corpus (see [[curate]]). */
  val NotCounted: Long = -1L

  /** Build the curated corpus frame plus a census thunk. The thunk
    * blocks until SOME action has materialized the returned frame
    * (Observation.get semantics) — run the frame first, then read the
    * census. */
  def curate(s: SparkSession, dir: String, minTokens: Int = 30,
      cap: Int = 15): (DataFrame, () => Census) = {
    val oIn = Observation("cp_ingested")
    val oQ = Observation("cp_quality")
    val oD = Observation("cp_deduped")

    val docs = t(s, dir, "documents")
      .observe(oIn, count(lit(1)).as("n"))
    val quality = docs
      .filter(size(split(col("text"), " ")) >= minTokens)
      // the payload column dies here: downstream stages key on its hash
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        xxhash64(col("text")).as("content_key"))
      .observe(oQ, count(lit(1)).as("n"))
    // keep-smallest-doc_id per content hash via min_by AGGREGATE, not a
    // row_number window: the aggregate partial-combines map-side (one
    // row per content_key leaves each task) where the window shuffles
    // and sorts every survivor row per key — same result, less traffic
    val deduped = quality
      .groupBy(col("content_key"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("lang"),
        col("n_chars")), col("doc_id")).as("__keep"))
      .select(col("__keep.doc_id").as("doc_id"),
        col("__keep.source").as("source"), col("__keep.lang").as("lang"),
        col("__keep.n_chars").as("n_chars"))
      .observe(oD, count(lit(1)).as("n"))
    val wc = Window.partitionBy(col("source"))
      .orderBy(CorpusOps.capOrder, col("doc_id"))
    val capped = deduped
      .withColumn("rk", row_number().over(wc))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

    def census(): Census = {
      def n(o: Observation): Long =
        o.get("n").asInstanceOf[Long]
      Census(n(oIn), n(oQ), n(oD),
        // the capped count is the output row count itself; reading it
        // via a fourth observe would need a node ABOVE the final sort —
        // the census consumer already has the materialized frame, so
        // spare the plan the extra aggregate and count the store
        NotCounted)
    }
    (capped, () => census())
  }

  /** One-call entry: materializes the curated corpus eagerly and
    * returns (corpus, complete census). */
  def run(s: SparkSession, dir: String, minTokens: Int = 30,
      cap: Int = 15): (DataFrame, Census) = {
    val (frame, census) = curate(s, dir, minTokens, cap)
    val out = Materialize.frame(frame)
    val c = census()
    (out, c.copy(capped = out.count()))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_pipeline" -> ((s: SparkSession, dir: String) =>
      curate(s, dir)._1))

  def oracle: Map[String, String] = Map(
    // the oracle partitions the dedup window by TEXT where Spark keys
    // xxhash64(text) — identical groups under any injective mapping
    "q_corpus_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, text, source, lang, n_chars FROM documents
        |  WHERE len(string_split(text, ' ')) >= 30
        |), d AS (
        |  SELECT doc_id, source, lang, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM q
        |), c AS (
        |  SELECT doc_id, source, lang, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('cap:' || doc_id), doc_id) AS rk
        |  FROM d WHERE rn = 1
        |)
        |SELECT doc_id, source, lang, n_chars FROM c
        |WHERE rk <= 15 ORDER BY doc_id""".stripMargin)
}
