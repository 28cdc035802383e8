package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #35-38: text analysis for training-data pipelines —
  * language ID, quality scoring, token counting, fingerprinting. All
  * single-pass projections + one aggregation; every expression is a
  * codegen'd built-in (no UDFs in the hot path).
  */
object TextOps {
  import Tables.t

  /** #35 stopword-heuristic language ID + confusion counts vs the
    * labeled `lang` column. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
    toks
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("n_tok"),
        count(when(col("tok").isin("the", "a", "of", "and"), 1)).as("n_stop"))
      .withColumn("guess",
        when(col("n_stop") / col("n_tok") >= 0.05, "en").otherwise("other"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))
  }

  /** #36 document quality score: token stats + digit/stopword ratios
    * folded into one [0,1] score (all exact integer-derived ratios).
    * The stopword and digit counts run in codegen'd kernels — a
    * higher-order filter lambda evaluates interpreted and knocks the
    * whole fused projection out of whole-stage codegen, and the regex
    * digit strip pays a per-row regex engine. */
  /** The [0,1] quality-score arithmetic over its input counts — ONE
    * definition shared by [[qualityScore]] (which feeds it the columns
    * it already computes, so the kernels run once and the plan is
    * unchanged) and the corpus-curation fuse (which inlines the kernels
    * into its single-scan projection); the two surfaces cannot drift. */
  private[graft] def scoreExpr(nStop: Column, nTok: Column,
      nDigit: Column, textLen: Column): Column =
    Num.r4(
      lit(0.4) * (nStop / nTok) +
        lit(0.3) * (least(nTok, lit(100L)) / 100.0) +
        lit(0.3) * (lit(1.0) - nDigit / textLen))

  /** [[scoreExpr]] over raw text, for single-consumer call sites (the
    * curation fuse) where no sibling column already carries the counts. */
  private[graft] def scoreCol(text: Column): Column =
    scoreExpr(
      graft.functions.text.tokenInListCount(
        text, Seq("the", "a", "of", "and")),
      size(split(text, " ")).cast("long"),
      graft.functions.text.digitCount(text),
      length(text))

  def qualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop", graft.functions.text.tokenInListCount(
        col("text"), Seq("the", "a", "of", "and")))
      .withColumn("n_digit", graft.functions.text.digitCount(col("text")))
      .withColumn("mean_tok_len",
        Num.r4((length(col("text")) - (col("n_tok") - 1)) / col("n_tok")))
      .withColumn("stop_ratio", Num.r4(col("n_stop") / col("n_tok")))
      .withColumn("digit_ratio",
        Num.r4(col("n_digit") / length(col("text"))))
      .withColumn("score", scoreExpr(col("n_stop"), col("n_tok"),
        col("n_digit"), length(col("text"))))
      .select(col("doc_id"), col("n_tok"), col("mean_tok_len"),
        col("stop_ratio"), col("digit_ratio"), col("score"))
      .orderBy(col("doc_id"))

  /** #37 token counting: whitespace + BPE-ish regex segmentation. The
    * segmentation count runs in the fused BpeTokenCount kernel (one
    * code-point pass, no regex engine, no materialized match array —
    * the regexp_extract_all form was the set's one real data-bound
    * loss at 100× docs, 5.2 s vs DuckDB's RE2 at 1.5 s;
    * regexp-parity fuzz-pinned). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bpe_tokens",
        graft.functions.text.bpeTokenCount(col("text")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("ws_total"),
        sum(col("bpe_tokens")).as("bpe_total"),
        Num.r4(avg(col("ws_tokens"))).as("ws_avg"))
      .orderBy(col("source"))

  /** #36b intra-document repetition ratio — the standard corpus-quality
    * signal (fraction of duplicate word trigrams; boilerplate and
    * degenerate generations score high). The whole trigram build +
    * dedup runs inside ONE fused TrigramStats kernel — a narrow
    * shuffle-free projection, never an explode: at 100 TB the naive
    * explode+groupBy(doc, trigram) shape would materialize ~n_tokens
    * rows per document, and even the array-expression form
    * (transform + array_distinct) pays an interpreted lambda plus a
    * per-trigram Column allocation per row. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("ts", graft.functions.text.trigramStats(col("text")))
      .withColumn("n_tri", col("ts.n_tri"))
      .withColumn("n_uniq", col("ts.n_uniq"))
      .withColumn("rep_ratio", Num.r4(
        when(col("n_tri") > 0,
          lit(1.0) - col("n_uniq") / col("n_tri")).otherwise(lit(0.0))))
      .select(col("doc_id"), col("n_tri"), col("n_uniq"), col("rep_ratio"))
      .orderBy(col("doc_id"))

  /** #38 rolling-hash document fingerprint: min md5 over char 5-grams
    * (winnowing with a single global window). The whole per-doc fold
    * runs inside one codegen'd expression (MinGramMd5) — a narrow
    * projection with NO explode and NO shuffle, vs the naive
    * explode+groupBy which materializes ~n_chars rows per doc. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        graft.functions.hashes.minGramMd5(col("text"), 5).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** #38b pseudonymization for log-derived training data: identities
    * become stable hashes (joinable, not reversible), IPs are masked to
    * /24 — the standard privacy pass before security logs leave the
    * trust boundary. Pure projection + one aggregation. */
  def pseudonymize(s: SparkSession, dir: String): DataFrame =
    graft.sources.CloudTrail.sharedFromEvents(s, dir)
      .select(
        col("aws_region"),
        md5(col("user_identity_arn")).as("actor_pseudo"),
        regexp_replace(col("source_ip_address"), "\\.\\d+$", ".0")
          .as("ip_masked"))
      .groupBy(col("aws_region"), col("ip_masked"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("actor_pseudo")).as("n_actors"))
      .orderBy(col("aws_region"), col("ip_masked"))

  /** PII patterns shared by the scan and the redactor. Kept to the
    * regex subset with identical semantics in Java regex (Spark) and
    * RE2 (the DuckDB oracle): character classes, bounded repetition,
    * \b word boundaries — no lookarounds, no backreferences. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** #81 PII census before corpus release: per-source counts of email /
    * IPv4 / SSN / phone matches and of documents carrying any of them —
    * the go/no-go report a pipeline checks before text leaves the trust
    * boundary (the synthetic corpus is PII-free, so every count is a
    * verified zero; PiiSpec proves the kernels on planted documents).
    * One scan, four codegen'd regexp_count projections, one map-side
    * combined aggregate — no explode, no shuffle of text. */
  def piiScan(s: SparkSession, dir: String): DataFrame = {
    // one fused string pass per pattern family (PiiCounts kernel) in a
    // single projection — the four-regexp_count form ran four
    // java.util.regex engines per row and was 4.3× DuckDB's RE2 at 10×
    // data; the kernel is parity-pinned against regexp_count by
    // PiiFuzzSpec
    val counts = t(s, dir, "documents")
      .withColumn("__pii", graft.functions.text.piiCounts(col("text")))
      .select(col("source") +: PiiPatterns.map { case (n, _) =>
        col(s"__pii.c_$n").as(s"c_$n") }: _*)
    counts
      .withColumn("flagged",
        PiiPatterns.map { case (n, _) => col(s"c_$n") > 0 }
          .reduce(_ || _).cast("int").cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flagged")).as("n_flagged") +:
          PiiPatterns.map { case (n, _) =>
            sum(col(s"c_$n")).cast("long").as(s"n_$n") }: _*)
      .orderBy(col("source"))
  }

  /** Redaction companion to [[piiScan]]: every match replaced by a
    * typed placeholder, applied in PiiPatterns order (email first so
    * its digits can't be re-matched as a phone). Pure projection —
    * composes with any corpus write. Spec-tested on planted PII. */
  def piiRedact(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Hashed-feature bucket of a token: hex digits 3-4 of md5(word) as
    * an int ∈ [0, 256) — the fastText hashing trick at demo width
    * (production widens to 2^20 buckets; the plan is unchanged). */
  private val QcBuckets = 256

  /** Deterministic "trained" weight for bucket b: first hex digit of
    * md5("qw:b") recentred to (2h-15)/16 ∈ ±0.9375 — exactly
    * representable in binary, so Spark's array fold and the oracle's
    * SUM agree bit-for-bit and the rounded scores can't straddle a
    * rounding boundary. The 256-entry table is computed once on the
    * driver and folded into the plan as an array literal. */
  private def qcWeight(b: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"qw:$b".getBytes("UTF-8"))
    val h = (digest(0) & 0xff) >>> 4
    (2 * h - 15) / 16.0
  }

  /** #82 linear quality classifier over hashed bag-of-words features —
    * the fastText-style model-based filter (CCNet/LLaMA-pipeline shape)
    * that complements the heuristic [[qualityScore]]: score =
    * sigmoid(4 · mean bucket weight). Inference is a shuffle-free
    * narrow projection: tokenize, bucket each token by md5 prefix, look
    * its weight up in the broadcast-by-literal table, fold — all inside
    * one codegen'd row-local expression; at 100 TB the weight table
    * rides the plan (or a broadcast join at 2^20 buckets) and the scan
    * never shuffles. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    // one fused fold per row (BucketWeightSum: thread-local digest, no
    // interpreted lambda, weight table as a reference object) — the
    // aggregate(transform(...md5...)) form re-created a MessageDigest
    // per token and ran the fold interpreted
    val wts = Array.tabulate(QcBuckets)(qcWeight)
    t(s, dir, "documents")
      .withColumn("n_tok",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("avg_w", Num.r4(
        graft.functions.text.bucketWeightSum(col("text"), wts)
          / col("n_tok")))
      .withColumn("score",
        Num.r4(lit(1.0) / (lit(1.0) + exp(lit(-4.0) * col("avg_w")))))
      .withColumn("verdict",
        when(col("score") >= 0.5, "keep").otherwise("drop"))
      .select(col("doc_id"), col("n_tok"), col("avg_w"), col("score"),
        col("verdict"))
      .orderBy(col("doc_id"))
  }

  /** BM25 parameters (the Robertson/Lucene defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** #75 BM25 relevance ranking of the corpus against a fixed query —
    * the retrieval scorer a training-data pipeline uses for
    * quality-weighted sampling and eval-set mining. One corpus scan:
    * doc length is computed BEFORE the token explode and carried
    * through it, so per-(doc, term) term frequencies need no join back
    * to the documents table; the explode is filtered to the query's
    * terms (at web scale: a broadcast hash set) before it shuffles, so
    * the aggregate sees only matching tokens. The per-term IDF frame is
    * ≤|query| rows — broadcast. Top-10 via orderBy+limit (TakeOrdered,
    * no global sort). */
  def bm25(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("spark", "table", "scan")): DataFrame = {
    // one row-local pass (TermStats kernel) computes the token total and
    // the per-term counts together — the split+explode form materialized
    // every word of every document just to keep the query-term hits, and
    // re-ran the split for the corpus stats. |docs| narrow rows reach
    // both consumers; nothing token-level is ever generated.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.text.termStats(col("text"), terms).as("ts"))
      .select(col("doc_id"), col("ts.dl").as("dl"), col("ts.cnts").as("cnts"))
      // two consumers (corpus stats, tf rows) — checkpoint the |docs|
      // narrow rows so the text scan + kernel runs once
      .transform(graft.Materialize.frame)
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"),
        posexplode(col("cnts")).as(Seq("ti", "tf")))
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"),
        element_at(lit(terms.toArray), col("ti") + 1).as("word"),
        col("tf"))
    val idf = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("word"),
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) /
          (col("df") + 0.5)).as("idf"),
        col("avgdl"))
    tf.join(broadcast(idf), Seq("word"))
      .withColumn("part",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(Num.r4(sum(col("part"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** #76 per-source TF-IDF signature terms: the corpus-analysis view
    * that tells you WHAT each slice of a mixture contains (and the
    * weighting behind classifier-based quality filters). The wide data
    * moves once — a map-side-combined (source, word) count; document
    * frequency and the top-3 window run over the aggregated
    * vocab×sources frame, which is bounded by |vocab|·|sources| no
    * matter the corpus size. */
  def tfidfTerms(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    // Three bounded passes, no full-vocab sort anywhere:
    //  1. (source, word) term frequency. The per-token rows never
    //     exist — WordCensus folds each document to (word, count)
    //     pairs in one row-local byte pass (byte-exact, empty tokens
    //     included), so the explode emits one row per DISTINCT word
    //     per document and the aggregate sums pre-counted c instead
    //     of probing once per token.
    //  2. ONE word-keyed pass computes df AND redistributes the
    //     (source, tf) pairs it grouped — a per-word group is bounded
    //     by |sources|, so the collect_list is a bounded struct list,
    //     and the old shape's second vocab-sized shuffle (tf joined
    //     back to the idf frame by word) disappears along with the
    //     checkpoint that fed two consumers.
    //  3. top-k per source via the bounded TopKWeighted aggregate —
    //     the window form row_number()-sorted each source's ENTIRE
    //     vocab slice on a single task; the aggregate ships k structs
    //     per source per map partition and merges.
    val tf = t(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.hashes.wordCensus(col("text"))).as("wc"))
      .groupBy(col("source"), col("wc.word").as("word"))
      .agg(sum(col("wc.c")).as("tf"))
    // n_src off the BOUNDED tf frame: every document contributes at
    // least one census row (an empty text is the single empty-string
    // word), so distinct sources in tf equal distinct sources in
    // documents. tf has TWO consumers (this scalar and the word-keyed
    // pass) and is NOT materialized, so the scan + census + (source,
    // word) aggregate lineage executes twice per run — measured
    // CHEAPER at ≤10× docs than the alternatives (a second source-only
    // table scan: 0.70-0.73 vs 0.60-0.64; a checkpoint of the word-
    // keyed frame feeding both consumers: ~0.8 vs ~0.65 same-JVM,
    // round 18 — the checkpoint write plus its two extra sequential
    // stages outweigh the ~0.25 s scan they save). The tradeoff
    // inverts once the corpus scan dominates the |vocab|-bounded
    // checkpoint — at a corpus scale well beyond these fixtures,
    // re-materialize tf (Materialize.frame) and derive n_src from it.
    val nSrc = tf.agg(countDistinct(col("source")).as("n_src"))
    val weighted = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        collect_list(struct(col("source"), col("tf"))).as("by_src"))
      .crossJoin(broadcast(nSrc))
      .select(col("word"),
        log(col("n_src").cast("double") / col("df")).as("idf"),
        explode(col("by_src")).as("st"))
      .select(col("st.source").as("source"), col("word"),
        (col("st.tf") * col("idf")).as("weight"))
    weighted.groupBy(col("source"))
      .agg(graft.functions.text.topKWeighted(
        col("weight"), col("word"), topK).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("source"), col("t.word").as("term"),
        Num.r4(col("t.weight")).as("weight"),
        (col("pos") + 1).cast("int").as("rnk"))
      // the output is ≤ topK×|sources| rows by construction: a single-
      // partition in-memory sort replaces orderBy's range-exchange
      // (which schedules a separate sampling job just to order it)
      .coalesce(1)
      .sortWithinPartitions(col("source"), col("rnk"))
  }

  /** #89 BPE tokenizer training, the data-side step: the adjacent
    * symbol-pair census that picks each merge (Sennrich et al. 2016 —
    * this is iteration one over character symbols; subsequent merges
    * re-run the same census over the updated symbol strings). Two
    * stages, each the scale-right shape:
    *
    *  1. word census — the canonical explode + map-side-combined count.
    *     The shuffle carries (word, partial) pairs, and by Heaps' law
    *     the distinct-word domain grows ~O(corpus^0.5), so stage 2's
    *     input is orders of magnitude smaller than the corpus;
    *  2. pair census over DISTINCT words, weighted by word frequency —
    *     each pair observation rides the word's count, never a per-
    *     occurrence row. The char-bigram lambda is interpreted, which
    *     is fine OFF the per-row hot path (|vocab| rows, not |tokens|);
    *     the top-k is a TakeOrdered, not a global sort.
    *
    * A production tokenizer trainer would loop stage 2 with a merge
    * table broadcast back over the word census — the census itself
    * never re-reads the corpus, which is the property that matters at
    * 100 TB: one text scan total, all iterations run on the vocab. */
  def bpePairs(s: SparkSession, dir: String, k: Int = 50): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(word) - 1)," +
          " i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("f")).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(k)

  /** #89b full BPE merge-training loop `q_bpe_train` (Sennrich et al.
    * 2016 end-to-end): starting from character symbols, repeat
    * `merges` times — count adjacent symbol pairs over the vocab
    * weighted by word frequency, take the most frequent pair
    * (ties: lexicographically smallest), merge it everywhere, recount.
    * This proves the "iterations ride the vocab" claim of [[bpePairs]]
    * end-to-end: the corpus is scanned ONCE for the word census
    * (materialized), and every merge iteration is a narrow projection
    * + pair census + TakeOrdered(1) over the |vocab| frame.
    *
    * Symbol strings use a DOUBLE-space separator with double-space
    * edges ("␣␣h␣␣e␣␣y␣␣") so a merge is one LITERAL string replace:
    * pattern "␣a␣␣b␣" → "␣ab␣". The single outer spaces make the
    * pattern consume only the INNER separator, so (1) a symbol can
    * never match a prefix/suffix of a longer symbol (both neighbors
    * are space-anchored) and (2) consecutive matches share no
    * characters — left-to-right non-overlapping replace IS greedy BPE
    * merge application ("a a a" + (a,a) → [aa, a]), identically in
    * Spark and DuckDB, with no per-row fold lambda. Only the chosen
    * merge (one row per step) ever reaches the driver — the same
    * bounded-model collect as the k-means centroids. Output: the
    * learned merge table (step, sym_a, sym_b, merged, freq). */
  /** The double-space symbol string of a word: "hey" → "␣␣h␣␣e␣␣y␣␣". */
  private def symString(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", " $1 "), lit(" "))

  /** One literal-replace merge application over a symbol string. */
  private def applyMerge(w: Column, a: String, b: String): Column =
    call_function("replace", w, lit(s" $a  $b "), lit(s" $a$b "))

  /** Re-materialize the learn loop's vocab every this-many merges:
    * each merge layers one replace projection on the vocab lineage, so
    * left unchecked step k re-analyzes/re-optimizes a k-deep chain —
    * O(merges²) plan work across a production 32k-merge vocabulary
    * (invisible at the shipped 8). Snapping the lineage periodically
    * bounds every census plan to < this many stacked replaces, keeping
    * per-iteration cost flat in the number of already-learned merges. */
  private[graft] val BpeMaterializeEvery = 16

  /** The driver merge-learning loop over a (w, f) vocab frame: each
    * step is a pair census + TakeOrdered(1); only the chosen merge row
    * reaches the driver. Shared by [[bpeTrain]] and [[bpeEncode]].
    * Returns the learned merges AND the final (fully merged) vocab
    * frame, whose lineage the lineage-bound spec inspects. */
  private[graft] def bpeLearnLoop(vocab: DataFrame, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var v = vocab
    val learned =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 1
    var dry = false
    while (step <= merges && !dry) {
      val top = v
        .select(col("f"),
          expr("filter(split(w, '  '), x -> length(x) > 0)").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(s) - 1)," +
            " i -> struct(element_at(s, i) AS a," +
            " element_at(s, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("freq"))
        .orderBy(col("freq").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, fr) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((step, a, b, a + b, fr))
        v = v.select(applyMerge(col("w"), a, b).as("w"), col("f"))
        if (step % BpeMaterializeEvery == 0) v = graft.Materialize.frame(v)
        step += 1
      }
    }
    (learned.toSeq, v)
  }

  def bpeTrain(s: SparkSession, dir: String, merges: Int = 8): DataFrame = {
    import s.implicits._
    val vocab = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .select(symString(col("word")).as("w"), col("f"))
      .transform(graft.Materialize.frame)
    bpeLearnLoop(vocab, merges)._1
      .toDF("step", "sym_a", "sym_b", "merged", "freq")
      .select(col("step").cast("int").as("step"), col("sym_a"),
        col("sym_b"), col("merged"), col("freq"))
      .orderBy(col("step"))
  }

  /** #89c BPE encode census `q_bpe_encode` — the tokenizer applied:
    * per-source token counts under the [[bpeTrain]]-learned merges
    * (the "how many tokens is my corpus under this tokenizer" question
    * every training-data budget starts from). ZERO additional corpus
    * scans beyond the one census: the per-(source, word) count frame
    * is materialized once, the global vocab for learning is its
    * aggregate, and the final per-source token sum is
    * Σ f(source, w) · n_tokens(w) computed on the SAME census rows —
    * n_tokens(w) is the learned replace chain + a token count, a
    * narrow vocab-domain projection. Output: (source, n_words,
    * n_tokens, avg_tokens_per_word). */
  def bpeEncode(s: SparkSession, dir: String, merges: Int = 8): DataFrame = {
    val census = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("f"))
      .select(col("source"), symString(col("word")).as("w"), col("f"))
      .transform(graft.Materialize.frame)
    // materialize the GLOBAL vocab once (the bpeTrain precedent): left
    // lazy, every one of the `merges` learn steps replays the census→
    // vocab rollup — one redundant |census|-row exchange per merge
    // (8 here, 32k in a production vocabulary build)
    val vocab = census.groupBy(col("w")).agg(sum(col("f")).as("f"))
      .transform(graft.Materialize.frame)
    val learned = bpeLearnLoop(vocab, merges)._1
    val applied = learned.foldLeft(col("w")) { case (c, (_, a, b, _, _)) =>
      applyMerge(c, a, b)
    }
    census
      .select(col("source"), col("f"), applied.as("__enc"))
      .select(col("source"), col("f"),
        size(expr("filter(split(__enc, '  '), x -> length(x) > 0)"))
          .cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        Num.r4(col("n_tokens") / col("n_words"))
          .as("avg_tokens_per_word"))
      .orderBy(col("source"))
  }

  /** q_bpe_train oracle: the `merges` iterations unrolled as CTE
    * triples (census → top-1 merge → replace), the same double-space
    * literal-replace representation. Assumes the corpus supports all
    * `merges` merges (every real corpus does; the generated testdata
    * yields thousands of distinct pairs): on a DRY corpus the empty
    * m_i makes every later v_j empty, so bpe_train still agrees with
    * the Spark early-stop (the union emits only found merges), but
    * bpe_encode's m1..m8 cross join would empty out — the Spark-side
    * dry semantics are spec-pinned instead (CorpusIrSpec). */
  private def bpeTrainSql(merges: Int): String = {
    def census(vn: String, cn: String): String =
      s"""$cn AS (
         |  SELECT s[i] AS a, s[i+1] AS b, CAST(sum(f) AS BIGINT) AS freq
         |  FROM (SELECT f, list_filter(string_split(w, '  '),
         |          x -> len(x) > 0) AS s FROM $vn) q,
         |    UNNEST(range(1, len(s))) t(i)
         |  GROUP BY 1, 2
         |)""".stripMargin
    val head =
      """WITH wf AS (
        |  SELECT word, count(*) AS f FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) WHERE len(word) >= 1 GROUP BY word
        |), v0 AS (
        |  SELECT ' ' || regexp_replace(word, '(.)', ' \1 ', 'g') || ' '
        |    AS w, f FROM wf
        |)""".stripMargin
    val iters = (1 to merges).map { i =>
      s"""${census(s"v${i - 1}", s"c$i")}, m$i AS (
         |  SELECT a, b, freq FROM c$i ORDER BY freq DESC, a, b LIMIT 1
         |), v$i AS (
         |  SELECT replace(v.w, ' ' || m.a || '  ' || m.b || ' ',
         |    ' ' || m.a || m.b || ' ') AS w, v.f
         |  FROM v${i - 1} v, m$i m
         |)""".stripMargin
    }.mkString(", ")
    val union = (1 to merges).map { i =>
      s"SELECT $i AS step, a AS sym_a, b AS sym_b, a || b AS merged," +
        s" freq FROM m$i"
    }.mkString(" UNION ALL ")
    s"$head, $iters $union ORDER BY step"
  }

  /** q_bpe_encode oracle: per-(source, word) census, the learning
    * chain unrolled over the GLOBAL vocab aggregate (same CTE triples
    * as the train oracle), then the 8 merges applied to the
    * per-source census rows and token counts summed. */
  private def bpeEncodeSql(merges: Int): String = {
    def census(vn: String, cn: String): String =
      s"""$cn AS (
         |  SELECT s[i] AS a, s[i+1] AS b, CAST(sum(f) AS BIGINT) AS freq
         |  FROM (SELECT f, list_filter(string_split(w, '  '),
         |          x -> len(x) > 0) AS s FROM $vn) q,
         |    UNNEST(range(1, len(s))) t(i)
         |  GROUP BY 1, 2
         |)""".stripMargin
    val head =
      """WITH wf AS (
        |  SELECT source, word, count(*) AS f FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS word
        |    FROM documents
        |  ) WHERE len(word) >= 1 GROUP BY source, word
        |), v0 AS (
        |  SELECT source,
        |    ' ' || regexp_replace(word, '(.)', ' \1 ', 'g') || ' ' AS w,
        |    f FROM wf
        |), g0 AS (SELECT w, sum(f) AS f FROM v0 GROUP BY w)""".stripMargin
    val iters = (1 to merges).map { i =>
      s"""${census(s"g${i - 1}", s"c$i")}, m$i AS (
         |  SELECT a, b, freq FROM c$i ORDER BY freq DESC, a, b LIMIT 1
         |), g$i AS (
         |  SELECT replace(g.w, ' ' || m.a || '  ' || m.b || ' ',
         |    ' ' || m.a || m.b || ' ') AS w, g.f
         |  FROM g${i - 1} g, m$i m
         |)""".stripMargin
    }.mkString(", ")
    val appliedW = (1 to merges).foldLeft("v0.w") { (acc, i) =>
      s"replace($acc, ' ' || m$i.a || '  ' || m$i.b || ' '," +
        s" ' ' || m$i.a || m$i.b || ' ')"
    }
    val mJoins = (1 to merges).map(i => s"m$i").mkString(", ")
    s"""$head, $iters, enc AS (
       |  SELECT v0.source, v0.f,
       |    len(list_filter(string_split($appliedW, '  '),
       |      x -> len(x) > 0)) AS n_tok
       |  FROM v0, $mJoins
       |)
       |SELECT source, CAST(sum(f) AS BIGINT) AS n_words,
       |  CAST(sum(f * n_tok) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(f * n_tok) AS DOUBLE) / sum(f), 4)
       |    AS avg_tokens_per_word
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** #94 PMI collocation mining `q_pmi_pairs`: the adjacent-word-pair
    * pointwise-mutual-information census — the classic phrase detector
    * (word2phrase / Mikolov-style "new_york" merging) a tokenizer or
    * embedding pipeline runs before training. Two map-side-combined
    * censuses over ONE text scan each (bigram pairs as two columns —
    * never a concatenated pair string on the 100 TB path — and the
    * unigram vocab), then PMI scored on the |bigram-vocab| census rows
    * with the unigram table BROADCAST (the ccnet precedent: vocab
    * ≪ corpus by Heaps' law) and top-k as a TakeOrdered. All factor
    * products are exact integers under 2^53 and the formula text is
    * identical in both engines, so ln/round agree bit-for-bit. */
  def pmiPairs(s: SparkSession, dir: String, minCount: Int = 5,
      k: Int = 30): DataFrame = {
    val docs = t(s, dir, "documents")
    // Bigram census on xxhash64 LONG pairs from the fused WordHashes
    // stream — word STRINGS never enter the wide shuffle (the r11
    // token-stream principle); the adjacency lambda runs over long
    // arrays, not strings. PMI and counts are injective-invariant, so
    // the string-keyed oracle agrees; word text is recovered for the
    // top-k ONLY, from the (tiny, broadcast) vocab census — which is
    // also where ca/cb come from. Collision odds ~vocab²/2^65.
    // Guard: a one-word doc yields size(hs)=1, and Spark's
    // sequence(1, 0) is DESCENDING [1, 0] — not empty — so the lambda
    // would reach element_at(hs, 0) and throw. Same trap documented at
    // the shingles guard (Dedup) and bpePairs' length filter; the
    // oracle's range(1, len(w)) is empty for len=1, so the filter also
    // keeps the engines semantically aligned.
    val bi = docs
      .select(graft.functions.hashes.wordHashes(col("text")).as("hs"))
      .filter(size(col("hs")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(hs) - 1)," +
          " i -> struct(element_at(hs, i) AS ha," +
          " element_at(hs, i + 1) AS hb))")).as("p"))
      .select(col("p.ha"), col("p.hb"))
      .groupBy(col("ha"), col("hb")).agg(count(lit(1)).as("c_ab"))
    val uni = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .withColumn("h", xxhash64(col("word")))
    val tot = bi.agg(sum(col("c_ab")).cast("double").as("n"))
    bi.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("h").as("ha"),
        col("word").as("wa"), col("c").as("ca"))), Seq("ha"))
      .join(broadcast(uni.select(col("h").as("hb"),
        col("word").as("wb"), col("c").as("cb"))), Seq("hb"))
      .crossJoin(broadcast(tot))
      .select(col("wa"), col("wb"), col("c_ab"),
        Num.r4(log((col("c_ab") * col("n")) / (col("ca") * col("cb"))))
          .as("pmi"))
      .orderBy(col("pmi").desc, col("wa"), col("wb"))
      .limit(k)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pmi_pairs" -> ((s: SparkSession, dir: String) => pmiPairs(s, dir)),
    "q_bpe_pairs" -> ((s: SparkSession, dir: String) => bpePairs(s, dir)),
    "q_bpe_train" -> ((s: SparkSession, dir: String) => bpeTrain(s, dir)),
    "q_bpe_encode" -> ((s: SparkSession, dir: String) => bpeEncode(s, dir)),
    "q_pseudonymize" -> pseudonymize _,
    "q_lang_id" -> langId _,
    "q_quality_score" -> qualityScore _,
    "q_repetition" -> repetition _,
    "q_token_count" -> tokenCount _,
    "q_fingerprint" -> fingerprint _,
    "q_bm25" -> ((s: SparkSession, dir: String) => bm25(s, dir)),
    "q_tfidf" -> ((s: SparkSession, dir: String) => tfidfTerms(s, dir)),
    "q_pii_scan" -> piiScan _,
    "q_quality_classifier" -> qualityClassifier _
  )

  def oracle: Map[String, String] = Map(
    "q_pmi_pairs" ->
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), bi AS (
        |  SELECT w[i] AS wa, w[i+1] AS wb
        |  FROM w, unnest(range(1, len(w))) t(i)
        |), cab AS (
        |  SELECT wa, wb, count(*) AS c_ab FROM bi GROUP BY 1, 2
        |), uni AS (
        |  SELECT word, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c_ab) AS DOUBLE) AS n FROM cab
        |)
        |SELECT wa, wb, CAST(c_ab AS BIGINT) AS c_ab,
        |  round(ln((c_ab * n) / (ua.c * ub.c)), 4) AS pmi
        |FROM cab JOIN uni ua ON ua.word = cab.wa
        |JOIN uni ub ON ub.word = cab.wb, tot
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, wa, wb LIMIT 30""".stripMargin,
    "q_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w AS word, count(*) AS f
        |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
        |  WHERE length(w) >= 2
        |  GROUP BY w
        |), pairs AS (
        |  SELECT substring(word, i, 2) AS pair, sum(f) AS freq
        |  FROM words, unnest(range(1, length(word))) AS t(i)
        |  GROUP BY 1
        |)
        |SELECT pair, CAST(freq AS BIGINT) AS freq
        |FROM pairs ORDER BY freq DESC, pair LIMIT 50""".stripMargin,
    "q_bpe_train" -> bpeTrainSql(8),
    "q_bpe_encode" -> bpeEncodeSql(8),
    "q_pii_scan" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN
        |      len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
        |      OR len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0
        |      OR len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) > 0
        |      OR len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
        |  CAST(sum(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_ipv4,
        |  CAST(sum(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))) AS BIGINT) AS n_ssn,
        |  CAST(sum(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))) AS BIGINT) AS n_phone
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // bucket = hex digits 3-4 of md5(word); weight(b) = (2h-15)/16 with
    // h the first hex digit of md5('qw:'||b) — weights are multiples of
    // 1/16 (exact doubles), so SUM/len matches Spark's fold exactly.
    "q_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), bw AS (
        |  SELECT doc_id, n_tok,
        |    (2 * (strpos('0123456789abcdef', substr(md5('qw:' ||
        |      ((strpos('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16
        |       + strpos('0123456789abcdef', substr(md5(word), 4, 1)) - 1)
        |      ), 1, 1)) - 1) - 15) / 16.0 AS wt
        |  FROM toks
        |), per AS (
        |  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |    round(sum(wt) / n_tok, 4) AS avg_w
        |  FROM bw GROUP BY doc_id, n_tok
        |)
        |SELECT doc_id, n_tok, avg_w,
        |  round(1.0 / (1.0 + exp(-4.0 * avg_w)), 4) AS score,
        |  CASE WHEN round(1.0 / (1.0 + exp(-4.0 * avg_w)), 4) >= 0.5
        |    THEN 'keep' ELSE 'drop' END AS verdict
        |FROM per ORDER BY doc_id""".stripMargin,

    "q_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), dl AS (
        |  SELECT doc_id, len(w) AS dl, w FROM docs
        |), stats AS (
        |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
        |), toks AS (
        |  SELECT doc_id, dl, unnest(w) AS word FROM dl
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf, min(dl) AS dl
        |  FROM toks WHERE word IN ('spark', 'table', 'scan')
        |  GROUP BY doc_id, word
        |), idf AS (
        |  SELECT word,
        |    ln(1 + (n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf,
        |    avgdl
        |  FROM tf, stats GROUP BY word, n_docs, avgdl
        |)
        |SELECT doc_id,
        |  round(sum(idf * (tf * 2.2) /
        |    (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS score
        |FROM tf JOIN idf USING (word)
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), tfc AS (
        |  SELECT source, word, count(*) AS tf FROM toks
        |  GROUP BY source, word
        |), ns AS (SELECT count(DISTINCT source) AS n_src FROM tfc),
        |idf AS (
        |  SELECT word, ln(CAST(n_src AS DOUBLE) / count(*)) AS idf
        |  FROM tfc, ns GROUP BY word, n_src
        |), wt AS (
        |  SELECT source, word AS term, round(tf * idf, 4) AS weight,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY tf * idf DESC, word) AS INTEGER) AS rnk
        |  FROM tfc JOIN idf USING (word)
        |)
        |SELECT source, term, weight, rnk FROM wt
        |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,

    "q_pseudonymize" ->
      s"""${graft.sources.CloudTrail.FromEventsCte}
         |SELECT aws_region,
         |  regexp_replace(source_ip_address, '\\.\\d+$$', '.0') AS ip_masked,
         |  count(*) AS n,
         |  count(DISTINCT md5(user_identity_arn)) AS n_actors
         |FROM ct
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), per AS (
        |  SELECT doc_id, lang, count(*) AS n_tok,
        |    count(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN 1 END)
        |      AS n_stop
        |  FROM toks GROUP BY doc_id, lang
        |), guessed AS (
        |  SELECT lang,
        |    CASE WHEN n_stop * 1.0 / n_tok >= 0.05 THEN 'en'
        |         ELSE 'other' END AS guess
        |  FROM per
        |)
        |SELECT lang, guess, count(*) AS n
        |FROM guessed GROUP BY lang, guess ORDER BY lang, guess""".stripMargin,

    "q_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tri AS (
        |  SELECT doc_id,
        |    GREATEST(len(w) - 2, 0) AS n_tri,
        |    CASE WHEN len(w) >= 3 THEN
        |      list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END AS tri
        |  FROM w
        |)
        |SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri,
        |  CAST(len(list_distinct(tri)) AS BIGINT) AS n_uniq,
        |  ROUND(CASE WHEN n_tri > 0
        |    THEN 1.0 - len(list_distinct(tri)) * 1.0 / n_tri
        |    ELSE 0.0 END, 4) AS rep_ratio
        |FROM tri ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    len(string_split(text, ' ')) AS n_tok,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and'))) AS n_stop,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
        |  FROM documents
        |)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  round((length(text) - (n_tok - 1)) * 1.0 / n_tok, 4)
        |    AS mean_tok_len,
        |  round(n_stop * 1.0 / n_tok, 4) AS stop_ratio,
        |  round(n_digit * 1.0 / length(text), 4) AS digit_ratio,
        |  round(0.4 * (n_stop * 1.0 / n_tok)
        |    + 0.3 * (least(n_tok, 100) / 100.0)
        |    + 0.3 * (1.0 - n_digit * 1.0 / length(text)), 4) AS score
        |FROM base ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """WITH base AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS ws_tokens,
        |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |      AS bpe_tokens
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ws_tokens) AS BIGINT) AS ws_total,
        |  CAST(sum(bpe_tokens) AS BIGINT) AS bpe_total,
        |  round(avg(ws_tokens), 4) AS ws_avg
        |FROM base GROUP BY source ORDER BY source""".stripMargin,

    "q_fingerprint" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, len(text)-4)) AS i
        |  FROM documents
        |)
        |SELECT doc_id, min(md5(substr(text, i, 5))) AS fingerprint
        |FROM pos GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
