package graft

import org.apache.spark.sql.functions._

/** Plan-shape guards: the scale properties SURVEY §5 promises, asserted
  * on the optimized physical plans so a future refactor cannot silently
  * reintroduce a quadratic or unpruned shape. */
class PlanShapeSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  test("no query plans a CartesianProduct") {
    // crossJoin with a broadcast side plans as BroadcastNestedLoopJoin;
    // an unconstrained CartesianProduct means a pairwise blowup slipped in
    for ((name, _) <- SparkEntry.queries) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("3-way join broadcasts the dimension sides") {
    val plan = planOf("q_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("semi/anti join scans orders once (single-pass count_if shape)") {
    // the EXISTS + NOT EXISTS pair must come off ONE distinct + left
    // join + one aggregate — the old two-join shape scanned and probed
    // orders twice for two scalar outputs
    val plan = planOf("q_semi_anti_join")
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).size
    assert(ordersScans == 1,
      s"orders scanned $ordersScans times:\n$plan")
    val customerScans = "customer\\.parquet".r.findAllIn(plan).size
    assert(customerScans == 1,
      s"customer scanned $customerScans times:\n$plan")
    assert(plan.contains("count_if") || plan.contains("count(if"),
      "both counts must ride one aggregate")
  }

  test("alert rule predicates reach the parquet scan") {
    val plan = planOf("q_alert_rule")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type)") ||
      plan.contains("EqualTo(event_type,error)"))
  }

  test("suppression joins broadcast the suppression set") {
    assert(planOf("q_alert_suppress").contains("BroadcastHashJoin"))
  }

  test("centroids aggregate vectors before any Generate") {
    // the per-label mean is ONE VectorSum aggregate with map-side
    // partials; a posexplode before the aggregation multiplies the
    // shuffle input by the vector dimension (the r9 3.4x entry). The
    // only Generate allowed is the output unroll ABOVE the final
    // aggregate.
    val plan = SparkEntry.queries("q_embedding_centroids")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vector_sum"), "centroids lost the VectorSum kernel")
    val gen = plan.indexOf("Generate")
    val agg = plan.lastIndexOf("ObjectHashAggregate")
    assert(gen >= 0 && agg > gen,
      "the Generate must sit above the final aggregate (output unroll), " +
        "never below it (per-row explode)")
  }

  test("IVF assignment is an aggregation, not a per-vector window sort") {
    // nearest-centroid argmax must be min_by aggregation (map-side
    // combined); a row_number window would sort+shuffle every
    // (vector × centroid) row
    val plan = planOf("q_ann_ivf")
    assert(!plan.contains("Window"), "q_ann_ivf plans a Window")
  }

  test("IVF-PQ prunes with an isin literal and plans no window") {
    // the probed cells are driver-computed and folded into the plan as
    // an IN literal — the predicate that partition-prunes a
    // cell-partitioned code table at scale; encoding/ADC are argmin
    // aggregates, never a per-vector window
    val plan = planOf("q_ann_ivf_pq")
    assert(!plan.contains("Window"), "q_ann_ivf_pq plans a Window")
    assert(plan.contains(" IN ") || plan.contains("cell#"),
      "q_ann_ivf_pq lost its literal cell-prune filter")
  }

  test("knnGraph/semDedup never broadcast the embeddings table") {
    // the pairwise block-compare must be a cell-keyed shuffle join: a
    // broadcast() of the corpus self-join side dies at the 8 GB
    // broadcast ceiling long before 100 TB. With the auto-broadcast
    // thresholds disabled, any surviving BroadcastExchange can only
    // come from an explicit broadcast hint — assert there is none.
    // (At real sizes AQE may still choose to broadcast a small DROPPED
    // set at runtime; that is size-based and fine.)
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      for (name <- Seq("q_knn_graph", "q_semdedup")) {
        val plan = planOf(name)
        assert(!plan.contains("BroadcastExchange"),
          s"$name broadcasts the embeddings table")
      }
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("pq encoding distances use the fused kernel, not lambda folds") {
    // zip_with/aggregate higher-order functions are CodegenFallback and
    // allocate per (row × codeword) — measured 5× slower at sf~1; the
    // subspace distances must stay on the codegen'd SquaredL2Distance
    val plan = planOf("q_ann_pq")
    assert(plan.contains("squared_l2_distance"),
      "q_ann_pq lost its fused distance kernel")
    assert(!plan.contains("zip_with"),
      "q_ann_pq regressed to lambda-fold distances")
  }

  test("minhash signatures and fingerprint are shuffle-free projections") {
    // both fold per-doc state inside one codegen'd expression; the only
    // exchange allowed is the final presentation sort
    for (name <- Seq("q_minhash_signatures", "q_fingerprint")) {
      val plan = planOf(name)
      assert(!plan.contains("HashAggregate"),
        s"$name re-grew an aggregation")
      assert(plan.contains("min_gram_md5") || plan.contains("minhash_slices"),
        s"$name lost its fused expression")
    }
  }

  test("repetition ratio is a shuffle-free per-row projection") {
    // trigram build + dedup stay inside array expressions; an
    // explode+groupBy(doc, trigram) shape would shuffle ~n_tokens rows
    // per document
    val plan = planOf("q_repetition")
    assert(!plan.contains("HashAggregate"), "q_repetition re-grew an agg")
    assert(!plan.contains("Generate"), "q_repetition explodes trigrams")
  }

  test("bpe pair census top-k is a TakeOrdered, not a global sort") {
    val plan = planOf("q_bpe_pairs")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bpe top-k lost TakeOrdered:\n$plan")
  }

  test("containment join is candidate-keyed with no nested-loop stage") {
    val plan = planOf("q_dedup_containment")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"containment fell back to a nested loop:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"containment funnels through one partition:\n$plan")
    assert(plan.contains("sorted_long_intersect_count"),
      "containment verify lost the candidate-only intersection kernel")
    // both g-keyed joins are hinted shuffled-hash: the SMJ sorts fed
    // consumers that immediately re-partition (doc_id window / pair
    // distinct) — a regression to SortMergeJoin re-buys both sorts
    assert(plan.contains("ShuffledHashJoin"),
      s"containment's g-keyed joins lost the shuffle_hash shape:\n$plan")
  }

  test("as-of candidate join is shuffled-hash, not sort-merge") {
    // the (keys, bucket) equi-join's output goes straight into the
    // leftId argmax regroup, so SMJ's two full sorts buy nothing; the
    // hash build is the per-(key, bucket)-bounded candidate side
    val plan = planOf("q_asof_join")
    assert(plan.contains("ShuffledHashJoin"),
      s"as-of candidate join lost the shuffle_hash shape:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"as-of candidate join regressed to sort-merge:\n$plan")
    // q_asof_join passes buildSide=left: errors are the rare side, so
    // the hash table holds them, not the 2x-duplicated click stream
    assert(plan.contains("BuildLeft"),
      s"as-of join lost its small-side build:\n$plan")
    // the argmax groups by (__lbk, keys, leftId) so it runs IN the
    // join's partitions — no exchange between the join and the agg
    val joinIdx = plan.indexOf("ShuffledHashJoin")
    val aggIdx = plan.lastIndexOf("HashAggregate", joinIdx)
    assert(aggIdx >= 0 &&
      !plan.substring(aggIdx, joinIdx).contains("Exchange"),
      s"as-of argmax re-shuffled the join output:\n$plan")
  }

  test("anchored-correlation candidate join is keyed by (actor, bucket)") {
    // the self-join must equi-join on the time bucket as well as the
    // actor — actor-only keys let one hot actor generate f² candidates
    import org.apache.spark.sql.functions.col
    val alerts = SparkEntry.queries("q_alert_rule")(spark, Sf)
      .select(col("alert_id"), col("actor"), col("object"), col("action"),
        col("event_time_s"))
    val plan = graft.engine.RuleEngine
      .anchoredParents(alerts, 60, 10000)
      .queryExecution.executedPlan.toString
    val joinLine = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("a_actor"))
    assert(joinLine.exists(l => l.contains("__abk") && l.contains("__pbk")),
      s"anchored parent join not keyed by time bucket:\n$plan")
    // the argmax groups by (actor, bucket, a_id), which the join's
    // output partitioning satisfies — no exchange may sit between the
    // aggregate and the join (the round-17 AsOf exchange-removal,
    // adopted here in round 18; the alert side enters the join once,
    // the parent side carries the bucket duplication)
    val joinIdx = plan.indexOf("Join [")
    val aggIdx = plan.lastIndexOf("Aggregate", joinIdx)
    assert(joinIdx >= 0 && aggIdx >= 0 &&
      !plan.substring(aggIdx, joinIdx).contains("Exchange"),
      s"anchored argmax re-shuffled the join output:\n$plan")
  }

  test("corpus ops broadcast their small sides and push their filters") {
    // the mixture quota dim and the eval gram-hash set are tiny by
    // construction — a SortMergeJoin would shuffle the corpus scan
    for (name <- Seq("q_corpus_mix", "q_decontaminate")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcast")
      assert(!plan.contains("SortMergeJoin"), s"$name shuffles the corpus")
    }
    // deterministic sampling is a pushdown-friendly filter, never an RNG
    // or a shuffle: the only exchange allowed is the presentation sort
    val sample = planOf("q_corpus_sample")
    assert(!sample.contains("HashAggregate") && !sample.contains("Window"),
      "q_corpus_sample re-grew an aggregation or window")
  }

  test("dedup pair joins are candidate-keyed, not content self-joins") {
    // the only equi-join keys in the LSH pair plan are bucket/doc ids —
    // a corpus-wide shingle equi-join would show sh#N as a join key
    val plan = planOf("q_dedup_lsh_pairs")
    assert(!plan.matches("(?s).*SortMergeJoin \\[sh#.*"))
    assert(!plan.matches("(?s).*BroadcastHashJoin \\[sh#.*"))
  }

  test("chunk census shuffles hashed longs, never chunk text") {
    // chunks are hashed inside the row-local transform; if chunk STRINGS
    // escaped into the exchange the plan would explode before hashing
    val plan = planOf("q_doc_chunk")
    assert(!plan.contains("Window"), "q_doc_chunk plans a window")
    // the explode emits the hash column only. Printed plans list
    // consumers ABOVE Generate: if chunk strings escaped the explode,
    // the hashing (concat_ws/xxhash64) would appear in a Project above
    // the Generate line instead of inside its generator expression.
    val consumers = plan.substring(0, plan.indexOf("Generate"))
    assert(!consumers.contains("concat_ws") && !consumers.contains("xxhash64"),
      "chunk text is materialized outside the per-row transform")
  }

  test("gram novelty has no gram-level join") {
    // both sides of the only join are doc-sized aggregates; a join whose
    // key is the gram hash (g#N) would re-shuffle the full gram stream
    val plan = planOf("q_gram_novelty")
    val joinLines = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty)
    assert(!joinLines.exists(_.matches(".*Join \\[g#.*")),
      s"novelty joins at gram level:\n${joinLines.mkString("\n")}")
  }

  test("gram ops stay on the fused gram kernel, not lambda chains") {
    // the word-4-gram contract must plan as the codegen'd
    // distinct_word_gram_hashes expression; an array_distinct(transform(
    // sequence)) chain is an interpreted CodegenFallback allocating a
    // string per gram per row — the scale-bug class the sf~1 run exposed
    for (name <- Seq("q_decontaminate", "q_source_overlap",
        "q_gram_novelty")) {
      val plan = planOf(name)
      assert(plan.contains("distinct_word_gram_hashes"),
        s"$name lost the fused gram kernel")
      assert(!plan.contains("array_distinct"),
        s"$name regressed to the interpreted gram chain")
    }
    // q_span_dedup checkpoints the gram array (Materialize.frame), so its
    // downstream plan shows only `Scan ExistingRDD` — assert the kernel on
    // the pre-checkpoint stage it actually runs in, and the checkpoint on
    // the final plan.
    val spanPre = Dedup.spanDocGrams(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(spanPre.contains("distinct_word_gram_hashes"),
      "q_span_dedup's gram stage lost the fused gram kernel")
    assert(!spanPre.contains("array_distinct"),
      "q_span_dedup regressed to the interpreted gram chain")
    val spanPlan = planOf("q_span_dedup")
    assert(spanPlan.contains("ExistingRDD"),
      "q_span_dedup lost its gram-array checkpoint (Materialize.frame)")
    assert(!spanPlan.contains("array_distinct"))
  }

  test("ccnet buckets broadcast the vocabulary, window only doc-level rows") {
    val plan = planOf("q_ccnet_buckets")
    assert(plan.contains("BroadcastHashJoin"), "vocab join lost broadcast")
    // the ntile window must consume the per-doc aggregate, not the token
    // stream: its partition column is the doc-level lang, ordered by the
    // aggregated score — a token-level window would show word#N
    val w = plan.substring(plan.indexOf("Window"))
    assert(!w.substring(1, math.min(w.length, 400)).contains("word#"),
      "ntile windows the token stream")
  }

  test("simhash pairs never sort the signature table for presentation") {
    // simhashPairs must compose the UNSORTED signature projection:
    // composing the presentation-sorted simhash() leaves a Sort that
    // EliminateSorts cannot see through the banding Generate, range-
    // shuffling the full signature table on both self-join sides (r21
    // plan audit: 3 rangepartitioning exchanges, 2 of them this). Only
    // the final orderBy(doc_a, doc_b) may range-partition.
    val plan = planOf("q_simhash_pairs")
    val ranges = "rangepartitioning".r.findAllIn(plan).size
    assert(ranges == 1, s"q_simhash_pairs has $ranges range exchanges:\n$plan")
  }

  test("window queries share one exchange with their presentation sort") {
    // the window clusters on K and the output is presented ordered by a
    // K-prefixed key, so ONE range exchange on K serves both (guide
    // §2.4); a second exchange means the repartitionByRange rewrite was
    // dropped and the whole window output is re-shuffled for the sort
    for (q <- Seq("q_running_window", "q_topk_window", "q_alert_correlate",
        "q_ann_batch", "q_domain_cap", "q_seq_pack")) {
      val plan = planOf(q)
      // a refactor that drops the Window node entirely must fail READABLY,
      // not as substring(0, -1) throwing StringIndexOutOfBounds
      assert(plan.contains("Window"), s"$q has no Window node:\n$plan")
      // tree text lists parents before children: anything ABOVE the
      // topmost Window (= before it in the string) must be exchange-free
      val aboveWindow = plan.substring(0, plan.indexOf("Window"))
      assert(!aboveWindow.contains("Exchange"),
        s"$q re-exchanges above its window:\n$plan")
      val ranges = "rangepartitioning".r.findAllIn(plan).size
      assert(ranges <= 1, s"$q has $ranges range exchanges")
    }
  }

  test("IVF centroids aggregate vectors, never posexplode the corpus") {
    // the per-label mean must be ONE VectorSum aggregate (D-length
    // buffer, map-side combined); posexplode(v) before the aggregation
    // multiplies every corpus row by the vector width ahead of its
    // exchange (the r9 3.4x lesson). Pinned on the centroid STAGE — the
    // final q_ann_ivf plan hides it behind the assignment checkpoint.
    val e = Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val plan = Ann.ivfCentroids(e).queryExecution.executedPlan.toString
    assert(plan.contains("vector_sum"),
      "ivfCentroids lost the VectorSum kernel")
    assert(!plan.contains("posexplode") && !plan.contains("Generate"),
      "ivfCentroids regressed to the posexplode build")
  }

  test("ivfCentroids rounding lambda equals Num.r4 at half-way boundaries") {
    // the half-away-from-zero floor form is spelled into the transform
    // lambda as a SQL string (a Column-level Num.r4 can't run inside a
    // higher-order function); this pin ties the two together so a future
    // Num.r4 change cannot silently drift the centroid surface. The
    // values are the exact IEEE half-way representations where
    // BigDecimal-based round() disagrees.
    import spark.implicits._
    val xs = Seq(0.53575, -0.53575, 0.00005, -0.00005,
      1.00005, -1.00005, 0.12345, -0.12345, 2.5e-5, 0.0)
    // one single-element vector per label: the per-label mean is x itself,
    // so cvec(0) is exactly the lambda applied to x
    val e = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, i.toLong, Seq(x)) }
      .toDF("vec_id", "label", "v")
    val got = Ann.ivfCentroids(e)
      .select(col("cell"), col("cvec").getItem(0).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = xs.zipWithIndex.map { case (x, i) =>
      i.toLong -> Seq(x).toDF("x").select(Num.r4(col("x"))).head.getDouble(0)
    }.toMap
    assert(got == want,
      s"ivfCentroids lambda drifted from Num.r4:\ngot  $got\nwant $want")
  }
}
