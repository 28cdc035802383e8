package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-construction operators for training-data pipelines: the
  * selection half of the story (dedup/quality are Dedup/TextOps) —
  * deciding WHICH documents enter a training mix, deterministically and
  * without any global sort, so the same code produces the same corpus
  * on 500 docs or 100 TB.
  *
  * All three operators key every decision off an md5 prefix of a
  * stable identity (the repo's cross-engine hash idiom — hex-string
  * comparison, identical in Spark and the DuckDB oracle):
  *
  *  - sampling is a FILTER, not RAND(): re-runs and retried tasks pick
  *    identical docs, and the sample composes with incremental loads;
  *  - mixture quotas become per-stratum hash THRESHOLDS (quota/count
  *    mapped to a 24-bit hex cutoff), so stratified sampling is a tiny
  *    count aggregate + broadcast join + filter — no per-stratum
  *    row_number window, which at web scale would sort billions of rows
  *    inside the 'en' partition;
  *  - train/valid/test folds hash the SOURCE, not the document, so all
  *    docs from one origin land in one fold (the standard guard against
  *    near-dup leakage across splits).
  */
object CorpusOps {
  import Tables.t

  /** Fraction → 6-hex-char cutoff: floor(frac·2^24) zero-padded, or a
    * sentinel above every hex digit when the stratum fits entirely
    * ('g' > 'f' lexicographically, so the filter keeps all rows). */
  private def hexCutoff(frac: Column): Column =
    when(frac >= 1.0, lit("g")).otherwise(
      lower(lpad(hex(floor(frac * (1 << 24)).cast("long")), 6, "0")))

  private def hashPrefix(salt: String, key: Column, len: Int): Column =
    substring(md5(concat_ws("", lit(salt + ":"), key)), 1, len)

  /** #63 deterministic ~10% corpus sample: keep docs whose salted
    * doc-id hash prefix falls below 0x1a/0x100 (26/256 ≈ 10.2%). A
    * pushdown-friendly projection+filter — no shuffle, no RNG state. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(hashPrefix("smp", col("doc_id"), 2) < "1a")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** #64 stratified mixture: target ≤40 docs per language. Per-lang
    * counts (tiny agg) → keep-fraction → hash threshold, broadcast back
    * and filtered. Two jobs, one scan each, zero wide shuffles; the
    * per-stratum quota error is O(sqrt(n)) of the hash uniformity,
    * which is how production mixtures are actually drawn at scale. */
  def stratifiedMix(s: SparkSession, dir: String, quota: Int = 40)
      : DataFrame = {
    val docs = t(s, dir, "documents")
    val cut = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cut", hexCutoff(lit(quota.toDouble) / col("cnt")))
      .select(col("lang"), col("cut"))
    docs.join(broadcast(cut), Seq("lang"))
      .filter(hashPrefix("mix", col("doc_id"), 6) < col("cut"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** #65 leakage-safe split: fold assignment hashes the SOURCE (80/10/
    * 10 by hex range), so near-duplicate docs from one origin can never
    * straddle train and eval. Output is the per-(fold, lang) census the
    * pipeline uses to validate the split. */
  def leakageSplit(s: SparkSession, dir: String): DataFrame = {
    val h = hashPrefix("split", col("source"), 2)
    t(s, dir, "documents")
      .withColumn("fold",
        when(h < "cc", "train").when(h < "e6", "valid").otherwise("test"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"))
      .orderBy(col("fold"), col("lang"))
  }

  /** #66 benchmark decontamination: flag training docs sharing any
    * n-gram with the held-out eval set (every 50th doc here; 4-grams
    * because the synthetic vocabulary is ~30 words — production uses
    * 8-13-gram windows, same plan). The eval side is tiny by
    * construction (benchmarks vs a 100 TB corpus), so its distinct
    * gram-hash set BROADCASTS and the corpus-side scan joins without
    * shuffling; grams are md5'd to fixed width before the join so the
    * broadcast carries 32-byte keys, not raw text. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    // per-doc grams are DEDUPED inside the projection (array_distinct on
    // the row-local gram array) before the explode: (doc_id, g) is then
    // unique by construction, so the final aggregate is a plain count —
    // no distinct-aggregate expand, and the exploded row count shrinks
    // by the intra-doc repetition factor before it ever hits the join
    val grams = t(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"),
        explode(Grams.distinctWordGrams(col("text"), "md5")).as("g"))
    val bench = grams.filter(col("doc_id") % 50 === 0)
      .select(col("g")).distinct()
    grams.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** #67 unigram-LM quality score: the corpus IS the language model —
    * token frequencies over the whole corpus give each word a log-prob,
    * and a document's quality signal is its mean token log-prob (docs of
    * rare/garbled tokens score low; the cheap stand-in for a KenLM
    * perplexity filter, same plan shape). Two aggregates over one
    * tokenized stream: the vocabulary (word → count) is orders of
    * magnitude smaller than the corpus, so the scored pass is a
    * BROADCAST join against the vocab — the 100 TB corpus shuffles only
    * into the final per-doc aggregate, map-side combined. At production
    * scale the vocab is capped to top-V with an OOV floor; the synthetic
    * vocabulary here fits whole. */
  def lmQuality(s: SparkSession, dir: String): DataFrame = {
    // hashed token stream, per-doc array checkpoint — same shape and
    // rationale as [[ccnetBuckets]] (injective word key, counts-only
    // output)
    val docToks = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.hashes.wordHashes(col("text")).as("hs"))
      .transform(graft.Materialize.frame)
    val toks = docToks.select(col("doc_id"), explode(col("hs")).as("h"))
    val freq = toks.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("total"))
    val lp = freq.crossJoin(broadcast(tot))
      .select(col("h"), log(col("cnt") / col("total")).as("logp"))
    toks.join(broadcast(lp), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        Num.r4(avg(col("logp"))).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** #68 temperature-scaled mixture sampling: per-language sampling
    * weight ∝ count^α (α=0.5 — the multilingual-training upsampling of
    * low-resource strata), mapped to a per-stratum hash cutoff exactly
    * like [[stratifiedMix]]: tiny census agg → broadcast → filter. No
    * per-stratum windows, no RNG; re-runs pick identical docs. */
  def temperatureMix(s: SparkSession, dir: String, alpha: Double = 0.5,
      target: Int = 200): DataFrame = {
    val docs = t(s, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val wsum = counts.agg(sum(pow(col("cnt"), alpha)).as("wsum"))
    val cut = counts.crossJoin(broadcast(wsum))
      .withColumn("cut",
        hexCutoff(pow(col("cnt"), alpha) / col("wsum") * target / col("cnt")))
      .select(col("lang"), col("cut"))
    docs.join(broadcast(cut), Seq("lang"))
      .filter(hashPrefix("tmp", col("doc_id"), 6) < col("cut"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** #78 sequence packing: assemble documents into fixed token-budget
    * training batches. Docs are hashed into P independent pack streams
    * (the distributed shape: each stream packs alone, no global
    * coordination; at 100 TB P scales with the cluster so each
    * stream's sort fits an executor), then greedily packed in
    * deterministic doc_id order — a running token cumsum per stream,
    * bin = the budget window the doc's start falls in. Output is the
    * per-(stream, bin) batch census a data loader consumes. One
    * shuffle on the stream key; everything else is a window + agg
    * inside the stream partition. */
  def seqPack(s: SparkSession, dir: String, budget: Int = 256,
      streams: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"),
        (conv(hashPrefix("pack", col("doc_id"), 6), 16, 10)
          .cast("long") % streams).as("stream"))
      // one range exchange on the window key serves the cumulative
      // window, the (stream, bin) aggregate (clustering on a superset
      // of the partition key needs no new exchange — same as the hash
      // exchange it replaces) AND the (stream, bin) presentation sort
      // (guide §2.4; r21 q_running_window shape). Sampler input is the
      // 3-column scan projection — cheap, per the r21 rejection rule.
      .repartitionByRange(col("stream"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / budget))
      .groupBy(col("stream"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("stream"), col("bin"))
  }

  /** #83 filter-funnel attrition report: the C4/Gopher-style cleaning
    * cascade (length → mean word length → stopword density → repetition)
    * with per-source survivor counts at every stage — the observability
    * view a pipeline owner reads before blessing a mixture ("source X
    * loses 90% at the repetition gate" is a data bug, not a filter).
    * All four signals are row-local array expressions computed in ONE
    * scan; stages are cumulative booleans folded into a single map-side
    * combined aggregate — no explode, no per-stage passes, no shuffle
    * of text. Thresholds are constructor-style constants here;
    * production parameterizes them per source. */
  def filterFunnel(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("mtl",
        (length(col("text")) - (col("n_tok") - 1)) / col("n_tok"))
      .withColumn("stop_ratio", graft.functions.text.tokenInListCount(
        col("text"), Seq("the", "a", "of", "and")) / col("n_tok"))
      .withColumn("ts", graft.functions.text.trigramStats(col("text")))
      .withColumn("rep_ratio", when(col("ts.n_tri") > 0,
        lit(1.0) - col("ts.n_uniq") / col("ts.n_tri")).otherwise(lit(0.0)))
      .withColumn("p1", (col("n_tok") >= 30).cast("int"))
      .withColumn("p2", (col("p1") === 1 && col("mtl") <= 4.6).cast("int"))
      .withColumn("p3",
        (col("p2") === 1 && col("stop_ratio") >= 0.04).cast("int"))
      .withColumn("p4",
        (col("p3") === 1 && col("rep_ratio") <= 0.02).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("p1")).as("n_len"),
        sum(col("p2")).as("n_wordlen"),
        sum(col("p3")).as("n_stopword"),
        sum(col("p4")).as("n_final"),
        Num.r4(sum(col("p4")) / count(lit(1))).as("keep_rate"))
      .orderBy(col("source"))

  /** #81a RAG chunking census: split each document into fixed word-count
    * chunks (64 words, stride 48 → 16-word overlap, the standard
    * retrieval-index shape) and report, per source, the chunk count and
    * the chunk-level EXACT-dup rate — the signal that tells a retrieval
    * pipeline how much of its index is redundant boilerplate. The chunk
    * text never leaves its row: chunks are hashed inside the per-row
    * array transform, so only (source, hash) pairs are exploded and the
    * 100 TB of text stays in the scan. Distinct counting is two-level
    * (groupBy (source, h) then source) — a map-side-combined shuffle of
    * longs, no count-distinct expand. */
  def docChunk(s: SparkSession, dir: String, chunk: Int = 64,
      stride: Int = 48): DataFrame = {
    val perChunk = t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("w"))
      .select(col("source"), explode(expr(
        s"""transform(sequence(0, cast(floor((size(w)-1)/$stride) as int)),
           |  k -> xxhash64(concat_ws(' ', slice(w, k*$stride+1, $chunk))))"""
          .stripMargin)).as("h"))
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("cnt"))
    perChunk.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        Num.r4(lit(1.0) - count(lit(1)) / sum(col("cnt"))).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** #81b gram-novelty curve: for each document (in doc_id ingest
    * order), the fraction of its distinct 4-grams that appear for the
    * FIRST time in the corpus with it — the "is new data still adding
    * anything" diagnostic read before paying to ingest more of a
    * source. Grams are deduped row-locally in one fused kernel
    * ([[graft.functions.DistinctWordGramHashes]]), keyed as xxhash64
    * longs (narrow shuffles; the oracle uses raw gram text — every
    * count is injective-mapping-invariant). Both consumers recompute
    * the gram scan from lineage: with the kernel the scan is cheap
    * codegen'd CPU, cheaper than writing a localCheckpoint of the
    * exploded gram stream and reading it back. */
  def gramNovelty(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"),
        explode(Grams.distinctWordGrams(col("text"), "xxhash64")).as("g"))
    // no gram-level join back: a doc's novel-gram count is just the
    // number of grams whose min-doc is that doc, so the first-seen
    // aggregate REAGGREGATES by its own result (first_doc) and meets
    // the per-doc gram census in a join of two doc-sized frames —
    // the gram stream is shuffled (by g, by doc_id) but never joined
    val novel = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("n_novel"))
    val census = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    census.join(novel, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        Num.r4(coalesce(col("n_novel"), lit(0L)) / col("n_grams"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** #81c CCNet-style quality buckets: per-language head/middle/tail
    * terciles of the unigram-LM score of [[lmQuality]] (CCNet buckets
    * web text by LM perplexity and trains preferentially on the head).
    * Buckets are RANK terciles — the oracle states them as ntile(3)
    * over (rounded score desc, doc_id) — because a rank is bit-exact
    * across engines where an interpolated percentile cutoff is not.
    *
    * Round 20 ships the production shape WITHOUT giving up that
    * bit-exactness: the output is a census aggregated to
    * (lang, bucket), and a census is TIE-INVARIANT — within one
    * (lang, score) group every doc is interchangeable, so the ntile
    * census is a pure function of the per-(lang, score) count
    * histogram, not of per-doc ranks. So instead of sorting every
    * scored doc per language (the ntile window's
    * superlinear-at-docs-1000× full-row sort — 5M rows through one
    * sort per language), aggregate the histogram (map-side combined;
    * bounded by |langs| × the 4dp score domain, never by |docs|),
    * compute cumulative positions over THAT frame, and split each
    * score's count across the tercile boundaries arithmetically
    * (ntile over n rows: n DIV 3 per bucket, first n%3 buckets one
    * extra). The only Window in the plan runs over histogram rows
    * (plan-pinned in ScaleOpsSpec); the census is the ntile census
    * exactly — not a sampled approximation — so the rank-form oracle
    * verifies it unchanged. */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    // Token identity is an xxhash64 LONG (WordHashes kernel — one hash
    // per word straight from the text bytes, no per-word string); the
    // previous form materialized the exploded token STRINGS (|tokens|
    // rows of (doc_id, lang, word)) and shuffled strings into the
    // vocabulary aggregate: 2.7 s vs DuckDB 0.9 s at 10×. Only counts
    // and averages-over-counts reach the output, so any injective word
    // key agrees with the string-keyed oracle.
    // Both consumers RECOMPUTE the kernel scan from lineage — the
    // gramNovelty rule, re-measured here at docs-1000× (round 20,
    // stage-timed): checkpointing the per-doc hash arrays wrote ~4 GB
    // in an 11.3 s stage, 85% of the query's 12.7 s wall, while the
    // two recompute scans cost ~2+3 s — recompute reads 5.8 s steady
    // (2.2× faster). The opposite 10× reading (checkpoint 1.39 s vs
    // recompute 1.78 s) was the fixed-cost regime; the shipped shape
    // is the one that holds at scale.
    val docToks = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.hashes.wordHashes(col("text")).as("hs"))
    val toks = docToks.select(col("doc_id"), col("lang"),
      explode(col("hs")).as("h"))
    val freq = toks.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("total"))
    val lp = freq.crossJoin(broadcast(tot))
      .select(col("h"), log(col("cnt") / col("total")).as("logp"))
    val scored = toks.join(broadcast(lp), Seq("h"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(Num.r4(avg(col("logp"))).as("score"))
    // (lang, score) histogram: the doc-level frame collapses map-side
    // into at most |langs| × |4dp score domain| rows — the bounded
    // frame every step below runs on.
    val hist = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    // positions covered by this score row: (lo, hi]; tercile bounds
    // (0, n1] / (n1, n12] / (n12, n] with ntile's first-buckets-larger
    // remainder rule
    val cum = hist
      .withColumn("hi", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .withColumn("lo", col("hi") - col("cnt"))
      .withColumn("n1", expr("n DIV 3 + if(n % 3 >= 1, 1, 0)"))
      .withColumn("n12", expr("n1 + n DIV 3 + if(n % 3 >= 2, 1, 0)"))
    val split = cum.select(col("lang"), col("score"), explode(array(
        struct(lit("head").as("bucket"),
          greatest(lit(0L),
            least(col("hi"), col("n1")) - col("lo")).as("k")),
        struct(lit("middle").as("bucket"),
          greatest(lit(0L), least(col("hi"), col("n12")) -
            greatest(col("lo"), col("n1"))).as("k")),
        struct(lit("tail").as("bucket"),
          greatest(lit(0L),
            col("hi") - greatest(col("lo"), col("n12"))).as("k"))))
        .as("b"))
      .select(col("lang"), col("b.bucket").as("bucket"), col("score"),
        col("b.k").as("k"))
      .filter(col("k") > 0)
    split.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("k")).as("n_docs"),
        Num.r4(sum(col("score") * col("k")) / sum(col("k")))
          .as("avg_score"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** #84 per-source exact cap (the C4/Gopher per-domain page cap): keep
    * at most `cap` documents per source (default 15; the synthetic corpus has ~25/source, so the cap binds), chosen by salted-hash order —
    * a deterministic "random" subset that is stable across re-runs and
    * incremental loads (same selection whether the source arrives in
    * one batch or fifty). Exact quota = rank window per source; the
    * sort is bounded by the largest SOURCE, not the corpus. For a
    * pathological mega-domain, pre-filter with the [[stratifiedMix]]
    * hash threshold at ~2× the cap and rank only the survivors — same
    * output, window input bounded at O(cap) per source. */
  /** The salted deterministic cap order — ONE definition, shared by
    * [[domainCap]] and [[CorpusPipeline]]: the "same selection whether
    * the source arrives in one batch or fifty" stability story depends
    * on every caller ordering by the byte-identical salt. */
  private[graft] def capOrder: Column =
    md5(concat_ws("", lit("cap:"), col("doc_id")))

  def domainCap(s: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(capOrder, col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      // range-partition on the window key up front: one exchange serves
      // both the ranking window and the (source, rk)-prefixed
      // presentation sort — rk is monotone in the window order within
      // each source, so the final sort is a within-partition extension
      // (guide §2.4; the r21 q_topk_window shape). The range sampler
      // only re-reads a 2-column scan projection, so the r21 rejection
      // rule (no sampler above an expensive subtree) is respected.
      .repartitionByRange(col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .orderBy(col("source"), col("rk"))
  }

  /** #90 deterministic training-order shuffle: the "random" read order
    * of one training epoch, reproducible from the seed alone — no RNG
    * state, no driver-side coordination, re-seedable per epoch. Docs
    * are salted-hashed into S order streams (a loader reads streams in
    * index order, or assigns one stream set per data-parallel worker)
    * and ordered inside each stream by the full hash; position is a
    * per-stream row_number, so every sort covers ONE stream. The
    * alternative — row_number over a global ORDER BY hash — funnels
    * the corpus through a single partition for numbering, the classic
    * scale bug this shape exists to avoid; S scales with the cluster
    * so each stream's sort stays executor-sized. Stream id reuses the
    * seq_pack digit trick (prefix mod 8 = last-hex-digit, oracle
    * needs no 48-bit hex parse). */
  /** `totalOrder = false` (the library default) returns the epoch
    * order PER-STREAM ordered with no global sort: after the
    * per-stream numbering window the frame is already hash-partitioned
    * on stream and sorted by (stream, pos) inside each partition —
    * exactly how a production loader consumes it (each data-parallel
    * worker reads its own streams; nothing ever needs the cross-stream
    * total order). `totalOrder = true` adds the presentation-only
    * global (stream, pos) sort the deterministic ORACLE comparison
    * wants — a range exchange over the whole corpus that exists for
    * the gate, not for any consumer — with the rolled frame
    * MATERIALIZED first so the range partitioner's sampling job reads
    * the cached 4-column result instead of re-running the numbering
    * window (the sars/login materialize-before-sort pattern; measured
    * 6.1 → 3.6 s at 5M docs). */
  def corpusShuffle(s: SparkSession, dir: String, seed: String = "ep1",
      streams: Int = 8, totalOrder: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col("__k"), col("doc_id"))
    val ordered = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        hashPrefix(s"shuf-$seed", col("doc_id"), 12).as("__k"),
        (conv(hashPrefix(s"shuf-$seed", col("doc_id"), 6), 16, 10)
          .cast("long") % streams).as("stream"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("stream"), col("pos"), col("doc_id"), col("source"))
    if (totalOrder)
      ordered.transform(graft.Materialize.frame)
        .orderBy(col("stream"), col("pos"))
    else ordered
  }

  /** #92 DSIR-style importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how target-like its hashed-feature
    * distribution is — the log-likelihood ratio between a TARGET
    * bucket-unigram model (here: the corpus's English slice) and the
    * RAW model, mean-per-token. The paper's core scaling trick is that
    * features hash into a FIXED bucket space, so both "models" are
    * 256-entry tables no matter the corpus size:
    *
    *  - one census pass builds raw + target bucket counts (bucket =
    *    md5 byte 1 of the word — the [[TextOps.qualityClassifier]]
    *    convention, mirrored verbatim by the oracle);
    *  - the Laplace-smoothed log-ratio table is a driver-side
    *    256-double array (bounded dimension, like the k-means
    *    centroids) folded into the fused BucketWeightSum kernel, so
    *    SCORING is one shuffle-free codegen'd projection per doc —
    *    no join of the token stream against anything;
    *  - weights are quantized to 1/1024 (dyadic): every partial sum
    *    is exactly representable, so the kernel's in-order fold and
    *    the oracle's group-sum agree bit-for-bit in any order — the
    *    same determinism trick the quality classifier's 1/16 table
    *    uses, applied to learned weights.
    *
    * The selection verdict is threshold-at-zero (more target-like than
    * raw); production DSIR samples against the weights instead — same
    * table, same plan. */
  /** The learned 256-entry LLR table of [[importanceWeights]], exposed
    * so the streaming gate (StreamingCorpus.targetGate) can score with
    * a frozen copy of the same model. `isTarget` marks the target
    * slice (default: the English docs). */
  def llrTable(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column = col("lang") === "en")
      : Array[Double] = {
    val counts = docs
      .select(isTarget.as("tgt"),
        explode(split(col("text"), " ")).as("word"))
      .select(col("tgt"),
        conv(substring(md5(col("word")), 3, 2), 16, 10)
          .cast("int").as("bkt"))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nr = counts.map(_._2).sum.toDouble
    val nt = counts.map(_._3).sum.toDouble
    val cr = Array.fill(256)(0L); val ct = Array.fill(256)(0L)
    counts.foreach { case (b, r, t) => cr(b) = r; ct(b) = t }
    Array.tabulate(256) { b =>
      val w = math.log((ct(b) + 1.0) / (nt + 256)) -
        math.log((cr(b) + 1.0) / (nr + 256))
      math.floor(w * 1024 + 0.5) / 1024
    }
  }

  def importanceWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val llr = llrTable(docs)
    docs
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("llr_mean", Num.r4(
        graft.functions.text.bucketWeightSum(col("text"), llr)
          / col("n_tok")))
      .withColumn("verdict",
        when(col("llr_mean") > 0, "keep").otherwise("drop"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        col("llr_mean"), col("verdict"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_importance_weights" -> ((s: SparkSession, dir: String) =>
      importanceWeights(s, dir)),
    "q_corpus_shuffle" -> ((s: SparkSession, dir: String) =>
      corpusShuffle(s, dir, totalOrder = true)),
    "q_domain_cap" -> ((s: SparkSession, dir: String) => domainCap(s, dir)),
    "q_doc_chunk" -> ((s: SparkSession, dir: String) => docChunk(s, dir)),
    "q_gram_novelty" -> (gramNovelty _),
    "q_ccnet_buckets" -> (ccnetBuckets _),
    "q_filter_funnel" -> (filterFunnel _),
    "q_decontaminate" -> (decontaminate _),
    "q_lm_quality" -> (lmQuality _),
    "q_mix_temperature" -> ((s: SparkSession, dir: String) =>
      temperatureMix(s, dir)),
    "q_corpus_sample" -> (hashSample _),
    "q_corpus_mix" -> ((s: SparkSession, dir: String) =>
      stratifiedMix(s, dir)),
    "q_leakage_split" -> (leakageSplit _),
    "q_seq_pack" -> ((s: SparkSession, dir: String) => seqPack(s, dir)))

  def oracle: Map[String, String] = Map(
    // bucket = md5 byte 1 of the word (the quality-classifier
    // convention); weights quantized to 1/1024 so the sum order
    // cannot move the 4dp rounding
    "q_importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, lang, n_tok,
        |    (strpos('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(md5(word), 4, 1)) - 1
        |      AS bkt
        |  FROM toks
        |), census AS (
        |  SELECT bkt, count(*) AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |  FROM b GROUP BY bkt
        |), tot AS (
        |  SELECT sum(cr) AS nr, sum(ct) AS nt FROM census
        |), llr AS (
        |  SELECT bkt,
        |    floor((ln((ct + 1.0) / (nt + 256)) - ln((cr + 1.0) / (nr + 256)))
        |      * 1024 + 0.5) / 1024.0 AS w
        |  FROM census, tot
        |), per AS (
        |  SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
        |    round(sum(w) / n_tok, 4) AS llr_mean
        |  FROM b JOIN llr USING (bkt)
        |  GROUP BY doc_id, lang, n_tok
        |)
        |SELECT doc_id, lang, n_tok, llr_mean,
        |  CASE WHEN llr_mean > 0 THEN 'keep' ELSE 'drop' END AS verdict
        |FROM per ORDER BY doc_id""".stripMargin,
    "q_corpus_shuffle" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    substr(md5('shuf-ep1:' || doc_id), 1, 12) AS k,
        |    CAST((strpos('0123456789abcdef',
        |      substr(md5('shuf-ep1:' || doc_id), 6, 1)) - 1) % 8 AS BIGINT)
        |      AS stream
        |  FROM documents
        |)
        |SELECT stream,
        |  CAST(row_number() OVER (PARTITION BY stream
        |    ORDER BY k, doc_id) AS BIGINT) AS pos,
        |  doc_id, source
        |FROM d ORDER BY stream, pos""".stripMargin,
    "q_domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('cap:' || doc_id), doc_id) AS INT) AS rk
        |  FROM documents
        |)
        |SELECT doc_id, source, rk FROM r
        |WHERE rk <= 15 ORDER BY source, rk""".stripMargin,
    // chunk/novelty counts are invariant under any injective gram/chunk
    // mapping, so the oracle keys on raw text where Spark keys on
    // xxhash64 longs — no shared hash function needed.
    "q_doc_chunk" ->
      """WITH d AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |), ch AS (
        |  SELECT source,
        |    list_aggregate(w[k*48+1 : k*48+64], 'string_agg', ' ') AS h
        |  FROM d, UNNEST(range(0,
        |    CAST(floor((len(w)-1)/48) AS BIGINT) + 1)) AS t(k)
        |), g AS (
        |  SELECT source, h, count(*) AS cnt FROM ch GROUP BY source, h
        |)
        |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
        |  count(*) AS n_unique,
        |  round(1.0 - count(*) * 1.0 / sum(cnt), 4) AS dup_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "q_gram_novelty" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |    list_aggregate(w[i:i+3], 'string_agg', ' ') AS g
        |  FROM words, UNNEST(range(1, len(w)-2)) AS t(i)
        |  WHERE len(w) >= 4
        |), fs AS (
        |  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    * 1.0 / count(*), 4) AS novelty
        |FROM grams JOIN fs USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ccnet_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), freq AS (
        |  SELECT word, count(*) AS cnt FROM toks GROUP BY word
        |), tot AS (SELECT sum(cnt) AS total FROM freq),
        |lp AS (SELECT word, ln(cnt / total) AS logp FROM freq, tot),
        |scored AS (
        |  SELECT doc_id, lang, round(avg(logp), 4) AS score
        |  FROM toks JOIN lp USING (word)
        |  GROUP BY doc_id, lang
        |), bucketed AS (
        |  SELECT lang, score,
        |    ['head', 'middle', 'tail'][
        |      ntile(3) OVER (PARTITION BY lang
        |                     ORDER BY score DESC, doc_id)] AS bucket
        |  FROM scored
        |)
        |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(score), 4) AS avg_score
        |FROM bucketed GROUP BY lang, bucket
        |ORDER BY lang, bucket""".stripMargin,

    "q_filter_funnel" ->
      """WITH base AS (
        |  SELECT source, text, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS n_tok
        |  FROM documents
        |), sig AS (
        |  SELECT source, n_tok,
        |    (length(text) - (n_tok - 1)) * 1.0 / n_tok AS mtl,
        |    len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and')))
        |      * 1.0 / n_tok AS stop_ratio,
        |    GREATEST(len(w) - 2, 0) AS n_tri,
        |    CASE WHEN len(w) >= 3 THEN
        |      1.0 - len(list_distinct(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))
        |        * 1.0 / GREATEST(len(w) - 2, 0)
        |    ELSE 0.0 END AS rep_ratio
        |  FROM base
        |), staged AS (
        |  SELECT source,
        |    CASE WHEN n_tok >= 30 THEN 1 ELSE 0 END AS p1,
        |    CASE WHEN n_tok >= 30 AND mtl <= 4.6 THEN 1 ELSE 0 END AS p2,
        |    CASE WHEN n_tok >= 30 AND mtl <= 4.6 AND stop_ratio >= 0.04
        |      THEN 1 ELSE 0 END AS p3,
        |    CASE WHEN n_tok >= 30 AND mtl <= 4.6 AND stop_ratio >= 0.04
        |      AND rep_ratio <= 0.02 THEN 1 ELSE 0 END AS p4
        |  FROM sig
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(p1) AS BIGINT) AS n_len,
        |  CAST(sum(p2) AS BIGINT) AS n_wordlen,
        |  CAST(sum(p3) AS BIGINT) AS n_stopword,
        |  CAST(sum(p4) AS BIGINT) AS n_final,
        |  round(sum(p4) * 1.0 / count(*), 4) AS keep_rate
        |FROM staged GROUP BY source ORDER BY source""".stripMargin,

    // conv(md5_prefix, 16, 10) % 8 depends only on the last hex digit
    // (16 = 0 mod 8), so the oracle derives the stream from digit 6
    // alone — same value, no BIGINT hex-parse needed in DuckDB.
    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |    CAST((strpos('0123456789abcdef',
        |      substr(md5('pack:' || doc_id), 6, 1)) - 1) % 8 AS BIGINT)
        |      AS stream
        |  FROM documents
        |), c AS (
        |  SELECT stream, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY stream ORDER BY doc_id) AS cum
        |  FROM d
        |)
        |SELECT stream, CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY stream, bin ORDER BY stream, bin""".stripMargin,

    "q_decontaminate" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    md5(list_aggregate(w[i:i+3], 'string_agg', ' ')) AS g
        |  FROM words, UNNEST(range(1, len(w)-2)) AS t(i)
        |  WHERE len(w) >= 4
        |), bench AS (
        |  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
        |)
        |SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared
        |FROM grams
        |WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_lm_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), freq AS (
        |  SELECT word, count(*) AS cnt FROM toks GROUP BY word
        |), tot AS (SELECT sum(cnt) AS total FROM freq),
        |lp AS (SELECT word, ln(cnt / total) AS logp FROM freq, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(logp), 4) AS avg_logprob
        |FROM toks JOIN lp USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_mix_temperature" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
        |), w AS (SELECT sum(power(cnt, 0.5)) AS wsum FROM c),
        |cut AS (
        |  SELECT lang,
        |    CASE WHEN power(cnt,0.5)/wsum*200/cnt >= 1.0 THEN 'g'
        |         ELSE lower(lpad(to_hex(CAST(floor(
        |           power(cnt,0.5)/wsum*200/cnt*16777216) AS BIGINT)), 6, '0'))
        |    END AS cut
        |  FROM c, w
        |)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN cut USING (lang)
        |WHERE substr(md5('tmp:' || d.doc_id), 1, 6) < cut.cut
        |ORDER BY d.doc_id""".stripMargin,

    "q_corpus_sample" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE substr(md5('smp:' || doc_id), 1, 2) < '1a'
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_mix" ->
      """WITH cut AS (
        |  SELECT lang,
        |    CASE WHEN 40.0 / count(*) >= 1.0 THEN 'g'
        |         ELSE lower(lpad(to_hex(CAST(
        |           floor(40.0 / count(*) * 16777216) AS BIGINT)), 6, '0'))
        |    END AS cut
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN cut USING (lang)
        |WHERE substr(md5('mix:' || d.doc_id), 1, 6) < cut.cut
        |ORDER BY d.doc_id""".stripMargin,

    "q_leakage_split" ->
      """SELECT
        |  CASE WHEN substr(md5('split:' || source), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5('split:' || source), 1, 2) < 'e6' THEN 'valid'
        |       ELSE 'test' END AS fold,
        |  lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY fold, lang""".stripMargin)
}
