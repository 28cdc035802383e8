package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Incremental corpus landing — the streaming half of the training-data
  * dedup pipeline. At 100 TB you never recompute signatures over the
  * whole corpus when a crawl batch arrives: new documents stream in,
  * exact duplicates are dropped AT INGEST (state bounded by the
  * watermark horizon, not stream length), and each surviving document's
  * MinHash signature is computed ONCE — the same fused
  * [[graft.functions.hashes.minhashSlices]] projection as the batch
  * path, so the landed signature store is bit-identical to what
  * `Dedup.minhashSignatures` would produce — then appended to the
  * parquet signature table that the batch LSH pair/cluster pipeline
  * (`Dedup.lshPairs`) consumes on its own cadence.
  *
  * Ref: the reference's connectors land raw batches on a schedule
  * (connectors_runner.py); this is the same landing contract with
  * continuous semantics and dedup-at-ingest.
  */
object StreamingCorpus {

  /** Exact-duplicate drop at ingest: content-keyed
    * dropDuplicatesWithinWatermark — a re-crawled/re-posted document
    * inside the horizon never lands twice; state for a content key is
    * evicted once the watermark passes it (the same bounded-state
    * guarantee StreamingAlerts.dedupStream proves for alert_ids). */
  def dedupIngest(docs: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    require(!docs.columns.contains("content_key"),
      "column content_key is reserved by dedupIngest")
    docs
      .withColumn("content_key", md5(col("text")))
      .withWatermark("ingest_time", watermark)
      .dropDuplicatesWithinWatermark("content_key")
  }

  /** The per-document signature projection: doc identity + 8 minhash
    * slices, one narrow codegen'd expression per row — no shuffle, no
    * state. Matches the batch `Dedup.minhashSignatures` columns. */
  def signatures(docs: DataFrame): DataFrame = {
    val arr = graft.functions.hashes.minhashSlices(col("text"))
    docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id") +: col("ingest_time") +:
        (0 until 8).map(i => element_at(arr, i + 1).as(s"mh$i")): _*)
  }

  /** Dedup against the HISTORICAL corpus — the duplicates
    * [[dedupIngest]] cannot see because they landed before the
    * watermark horizon. The exact answer is a stream-static anti-join,
    * but that probes the full 100 TB history's key set every
    * micro-batch; the scale shape is [[graft.operators.BloomDedupGate]]
    * applied to the stream: a Bloom filter built ONCE over history
    * (per AvailableNow landing cycle — rebuild each cycle, exactly
    * like the batch connectors re-read their watermark) splits each
    * micro-batch into Bloom-negative docs (certainly new — admitted
    * with NO join; Bloom filters have no false negatives) and an
    * ε-sliver of Bloom-positives that goes through the exact
    * stream-static anti-join. Result: exact semantics, history touched
    * only by |batch|·ε probe rows.
    *
    * `historyKeys` is a BATCH frame of xxhash64 content keys (one
    * column `h`); the filter is built before the stream starts. */
  def novelAgainstHistory(docs: DataFrame, historyKeys: DataFrame,
      expected: Long, fpp: Double = 0.01): DataFrame = {
    require(!docs.columns.contains("h"),
      "column h is reserved by novelAgainstHistory")
    val bf = graft.operators.BloomDedupGate.build(
      historyKeys, "h", expected, fpp)
    val keyed = docs.withColumn("h", xxhash64(col("text")))
    val (certainlyNew, candidates) =
      graft.operators.BloomDedupGate.gate(keyed, "h", bf)
    certainlyNew
      .unionByName(candidates.join(historyKeys, Seq("h"), "left_anti"))
      .drop("h")
  }

  /** Model-based quality gate in-stream — DSIR data selection applied
    * at ingest: score each arriving document with a FROZEN 256-entry
    * log-likelihood-ratio table (learned offline by
    * `CorpusOps.llrTable` over the landed corpus) and admit docs more
    * target-like than raw. The score is the fused BucketWeightSum
    * kernel — a stateless codegen'd projection: no state store, no
    * shuffle, valid under any trigger, and bit-identical to the batch
    * `CorpusOps.importanceWeights` score for the same table
    * (spec-pinned). Refresh cadence = restart the query with the next
    * landing cycle's table, exactly how [[novelAgainstHistory]]
    * refreshes its Bloom filter. */
  def targetGate(docs: DataFrame, llr: Array[Double],
      threshold: Double = 0.0): DataFrame =
    docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("llr_mean", graft.Num.r4(
        graft.functions.text.bucketWeightSum(col("text"), llr)
          / col("n_tok")))
      .filter(col("llr_mean") > threshold)

  /** #83c streaming semantic-dedup gate — SemDeDup applied AT INGEST
    * against the historical vector corpus (the online half of the
    * batch `q_semdedup` census): each arriving embedding is assigned
    * its Voronoi cell by the fused NearestCentroid kernel (the seed
    * matrix is FROZEN per landing cycle and folded into the plan — a
    * stateless codegen'd projection: no state store, valid under any
    * trigger, the [[targetGate]] precedent), then dropped iff a
    * HISTORICAL vector in the same cell has cosine ≥ `tau` — a
    * stream-static LEFT ANTI join whose condition is the cell
    * equi-key plus the cosine residual, exactly the batch operator's
    * cell-keyed compare. At 100 TB `cellStore` is the landed vector
    * table PARTITIONED BY cell, so a micro-batch probes only the
    * partitions of the cells it touches; refresh cadence = restart
    * the query with the next landing cycle's seeds + store, like the
    * Bloom filter of [[novelAgainstHistory]]. Same-cell blocking
    * carries the batch operator's documented blind spot — a near-dup
    * pair straddling a cell boundary is not seen (spec-pinned).
    *
    * @param vecs      streaming frame with a `v` array&lt;double&gt; column
    * @param seeds     frozen (cid, centroid) seed matrix — build with
    *                  [[graft.Ann.seedCentroidsOf]] over history
    * @param cellStore batch frame (s_cell, sv): history vectors keyed
    *                  by their cell under the SAME seeds */
  def semanticGate(vecs: DataFrame, seeds: Seq[(Long, Array[Double])],
      cellStore: DataFrame, tau: Double = 0.35): DataFrame = {
    require(!vecs.columns.contains("cell"),
      "column cell is reserved by semanticGate")
    vecs
      .withColumn("cell",
        graft.functions.vec.nearestCentroid(col("v"), seeds)
          .getField("cid"))
      .join(cellStore,
        col("cell") === col("s_cell") &&
          graft.Num.r4(
            graft.functions.vec.cosine(col("v"), col("sv"))) >= tau,
        "left_anti")
  }

  /** The (seeds, cellStore) pair [[semanticGate]] freezes per landing
    * cycle, built from a landed history frame with a `v` column. */
  def cellStoreOf(history: DataFrame, cells: Int = 32)
      : (Seq[(Long, Array[Double])], DataFrame) = {
    val seeds = graft.Ann.seedCentroidsOf(history, cells)
    if (seeds.isEmpty)
      return (seeds,
        history.select(lit(0L).as("s_cell"), col("v").as("sv")).limit(0))
    val store = history.select(
      graft.functions.vec.nearestCentroid(col("v"), seeds)
        .getField("cid").as("s_cell"),
      col("v").as("sv"))
    (seeds, store)
  }

  /** Land the deduped signature stream into a parquet signature store:
    * append-only micro-batches (the landing contract — downstream LSH
    * reads the store on its own cadence; at-least-once on failure, the
    * store dedups on doc_id at read time if the sink ever replays). */
  def landSignatures(docs: DataFrame, storeDir: String,
      checkpointDir: String,
      watermark: String = "10 minutes"): StreamingQuery =
    signatures(dedupIngest(docs, watermark))
      .writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The vector-side landing cycle, composing [[semanticGate]] the way
    * [[landSignatures]] composes [[dedupIngest]]: arriving embeddings
    * are gated against the frozen (seeds, cellStore) pair and the
    * survivors append — WITH their cell — to a parquet vector store
    * PARTITIONED BY cell, so the store the next cycle freezes (and
    * every batch cell-keyed operator reads) is already laid out for
    * cell-partition pruning. AvailableNow cycles mirror the batch
    * connectors' scheduled landings; refresh = rebuild the store pair
    * from the grown store and restart, the Bloom-filter cadence. */
  def landVectors(vecs: DataFrame, seeds: Seq[(Long, Array[Double])],
      cellStore: DataFrame, storeDir: String, checkpointDir: String,
      tau: Double = 0.35): StreamingQuery =
    semanticGate(vecs, seeds, cellStore, tau)
      .writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cell")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()

  /** [[landVectors]] with PRECOMPUTED PQ codes stamped on every landed
    * row: the frozen per-cycle model grows from (seeds, cellStore) to
    * (seeds, cellStore, codebook), and the code array is a narrow
    * fused projection ([[graft.Ann.pqCodeArray]] — per-subspace
    * NearestCentroid argmins over the driver-folded codebook), so the
    * append-mode micro-batch stays aggregation-free. The landed layout
    * (vec_id, v, codes) PARTITIONED BY cell is the full production
    * IVF-PQ index: [[graft.Ann.ivfPqAnnStore]] searches it reading
    * codes only, under cell partition pruning. */
  def landVectorsPq(vecs: DataFrame, seeds: Seq[(Long, Array[Double])],
      cellStore: DataFrame, codebook: Seq[(Long, Array[Double])],
      storeDir: String, checkpointDir: String,
      tau: Double = 0.35): StreamingQuery =
    semanticGate(vecs, seeds, cellStore, tau)
      .withColumn("codes", graft.Ann.pqCodeArray(codebook))
      .writeStream
      .format("parquet")
      .option("path", storeDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cell")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
}
