package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomDedupGate, SaltedJoin}

/** Specs for the round-8 scale utilities (salted join, Bloom dedup
  * gate) and the new corpus diagnostics (chunk census, gram novelty,
  * CCNet buckets).
  */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  // a deliberately skewed fat side: key 1 carries 90% of the rows
  private lazy val fat = spark.range(0, 2000)
    .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(1L))
      .as("k"), col("id").as("payload"))
  private lazy val slim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (5L, "d"))
    .toDF("k", "tag")

  test("salted join equals the plain join row-for-row") {
    val plain = fat.join(slim, Seq("k")).select("k", "payload", "tag")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SaltedJoin.inner(fat, slim, Seq("k"), salts = 8)
      .select("k", "payload", "tag")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted join spreads a hot key over multiple partitions") {
    val spread = SaltedJoin.inner(fat, slim, Seq("k"), salts = 8)
      .filter(col("k") === 1L)
      .select(spark_partition_id().as("p"))
      .distinct().count()
    assert(spread > 1, s"hot key stayed on $spread partition(s)")
  }

  test("salted join is deterministic across re-runs (no rand salt)") {
    def run() = SaltedJoin.inner(fat, slim, Seq("k"), salts = 8)
      .withColumn("p", spark_partition_id())
      .groupBy("p").count().collect().map(_.toSeq).sortBy(_.toString)
    assert(run().sameElements(run()))
  }

  test("bloom gate: no false negatives, composed pass equals exact anti-join") {
    val history = spark.range(0, 5000)
      .select(xxhash64(concat(lit("doc:"), col("id"))).as("h"))
    val incoming = spark.range(4000, 9000)
      .select(xxhash64(concat(lit("doc:"), col("id"))).as("h"))
    val bf = BloomDedupGate.build(history, "h", expected = 5000, fpp = 0.03)
    // every historical hash probes positive (definitive-negative law)
    val (certainNew, _) = BloomDedupGate.gate(history, "h", bf)
    assert(certainNew.count() == 0L)
    // composed pass == plain anti-join
    val exact = incoming.join(history, Seq("h"), "left_anti")
      .collect().map(_.getLong(0)).sorted
    val gated = BloomDedupGate.novel(incoming, history, "h", bf)
      .collect().map(_.getLong(0)).sorted
    assert(gated.sameElements(exact))
    // the gate actually short-circuits most novel rows past the join
    val (fastPath, candidates) = BloomDedupGate.gate(incoming, "h", bf)
    assert(fastPath.count() > 3000L,
      s"fast path admitted only ${fastPath.count()} of 4000 novel rows")
    assert(candidates.count() < 2000L)
    // the probe is a native expression, not a udf: the gate projection
    // stays inside whole-stage codegen (a BatchEvalPython/ScalaUDF node
    // would split the fused pipeline)
    val plan = fastPath.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), "probe expression lost")
    assert(!plan.contains("ScalaUDF"), "probe regressed to a udf")
    // "*(n)" prefixes mark whole-stage-codegen'd operators; the Filter
    // carrying the probe must be inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_might_contain") && l.trim.stripPrefix("+- ")
        .startsWith("*(")), "gate fell out of codegen")
  }

  test("doc chunk census: counts conserve and dup rate is bounded") {
    val r = Materialize.frame(CorpusOps.docChunk(spark, Sf))
    assert(r.count() > 0)
    // every source's uniques cannot exceed its chunks; rate in [0, 1)
    assert(r.filter(col("n_unique") > col("n_chunks")).count() == 0)
    assert(r.filter(col("dup_rate") < 0 || col("dup_rate") >= 1)
      .count() == 0)
    // total chunks = sum over docs of ceil shape: floor((n_tok-1)/48)+1
    val expected = Tables.t(spark, Sf, "documents")
      .select((floor((size(split(col("text"), " ")) - 1) / 48) + 1)
        .as("n")).agg(sum("n")).collect().head.getLong(0)
    assert(r.agg(sum("n_chunks")).collect().head.getLong(0) == expected)
  }

  test("gram novelty: doc 1 is all-novel and fractions are consistent") {
    val r = Materialize.frame(CorpusOps.gramNovelty(spark, Sf))
    val first = r.orderBy("doc_id").limit(1).collect().head
    // the earliest doc's grams are first-seen by definition
    assert(first.getLong(r.columns.indexOf("n_novel")) ==
      first.getLong(r.columns.indexOf("n_grams")))
    assert(r.filter(col("n_novel") > col("n_grams")).count() == 0)
    // every gram is novel somewhere exactly once: novel counts sum to
    // the corpus-wide distinct gram count
    val totalNovel = r.agg(sum("n_novel")).collect().head.getLong(0)
    val distinctGrams = Tables.t(spark, Sf, "documents")
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 4)
      .select(explode(expr(
        """transform(sequence(1, size(w)-3),
          |  i -> concat_ws(' ', element_at(w,i), element_at(w,i+1),
          |                 element_at(w,i+2), element_at(w,i+3)))"""
          .stripMargin)).as("g"))
      .distinct().count()
    assert(totalNovel == distinctGrams)
  }

  /** Driver-side mirror of Ann's Voronoi cell blocking: assign every
    * vector to the nearest of the 32 lowest-vec_id seeds by
    * 4dp-rounded squared L2 (ties to the smallest seed id) — the same
    * rule as nearestSeed / the DuckDB oracle's assign CTE. */
  private def cellsOf(vecs: Array[(Long, String, Array[Double])])
      : Map[Long, Long] = {
    def sq4(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i) - b(i); acc += d * d; i += 1 }
      // EXACT kernel rounding (Num.r4): floor(x·1e4 + 0.5)/1e4 — a
      // BigDecimal HALF_UP mirror can disagree at representable
      // half-way points and flake a distance tie
      math.floor(acc * 10000.0 + 0.5) / 10000.0
    }
    val seeds = vecs.filter(_._1 < 32).sortBy(_._1)
    vecs.map { case (id, _, v) =>
      id -> seeds.map { case (sid, _, sv) => (sq4(v, sv), sid) }.min._2
    }.toMap
  }

  private def cos4(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    // same floor(x·1e4 + 0.5)/1e4 rounding as Num.r4 (see sq4)
    val c = d / (math.sqrt(na) * math.sqrt(nb))
    math.floor(c * 10000.0 + 0.5) / 10000.0
  }

  private def embVecs(): Array[(Long, String, Array[Double])] =
    Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(row => (row.getLong(0), String.valueOf(row.get(1)),
        row.getSeq[Double](2).toArray))

  test("diverseSample picks the seed-nearest member of every cell") {
    def sq4(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      math.floor(acc * 10000.0 + 0.5) / 10000.0
    }
    val vecs = embVecs()
    val seeds = vecs.filter(_._1 < 32).sortBy(_._1)
      .map(v => v._1 -> v._3).toMap
    val cellOf = cellsOf(vecs)
    val expected = vecs.groupBy(v => cellOf(v._1))
      .filter(_._2.length <= 500)
      .map { case (cell, members) =>
        val (dist, rep) = members
          .map { case (id, _, v) => (sq4(v, seeds(cell)), id) }.min
        cell -> ((members.length.toLong, rep, dist))
      }
    val got = Ann.diverseSample(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected && expected.nonEmpty)
  }

  test("knn graph: rank-1 edges match a brute-force driver computation") {
    val r = Materialize.frame(Ann.knnGraph(spark, Sf))
    // k bound and rank integrity
    assert(r.groupBy("vec_id").count().filter(col("count") > 3).count() == 0)
    assert(r.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // brute-force pin: recompute every rank-1 same-cell neighbor from
    // raw vectors (cells small enough that no hot-cap fires at sf0.001)
    val vecs = embVecs()
    val cellOf = cellsOf(vecs)
    val byCell = vecs.groupBy(v => cellOf(v._1))
    val expected = vecs.flatMap { case (id, _, v) =>
      val peers = byCell(cellOf(id)).filter(_._1 != id)
      if (peers.isEmpty) None
      else Some(id -> peers
        .map { case (nid, _, nv) => (nid, cos4(nv, v)) }
        .minBy { case (nid, c) => (-c, nid) })
    }.toMap
    val got = r.filter(col("rank") === 1)
      .select("vec_id", "nbr_id", "cosine").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("semdedup: census is consistent with the pair rule") {
    val r = Materialize.frame(Ann.semDedup(spark, Sf))
    assert(r.filter(col("n_dropped") > col("n_vecs")).count() == 0)
    assert(r.filter(col("keep_rate") < 0 || col("keep_rate") > 1)
      .count() == 0)
    // totals conserve: labels partition the vector set
    val total = r.agg(sum("n_vecs")).collect().head.getLong(0)
    assert(total == Tables.t(spark, Sf, "embeddings").count())
    // the minimum vec_id of every CELL always survives (nothing can
    // precede it in the greedy same-cell order)
    val cellOf = cellsOf(embVecs())
    val nCells = cellOf.values.toSet.size
    val droppedAll = Ann.semDedup(spark, Sf, tau = -1.0) // drop ALL non-canonical
    val fullDrop = droppedAll.agg(sum("n_dropped"), sum("n_vecs"))
      .collect().head
    assert(fullDrop.getLong(1) - fullDrop.getLong(0) == nCells)
  }

  test("semdedup: per-label census equals driver brute force") {
    val vecs = embVecs()
    val cellOf = cellsOf(vecs)
    // dropped is decided by same-CELL pairs; the census then rolls the
    // dropped set up per label
    val droppedIds = (for {
      (ia, _, va) <- vecs; (ib, _, vb) <- vecs
      if ia < ib && cellOf(ia) == cellOf(ib) && cos4(va, vb) >= 0.35
    } yield ib).toSet
    val expected = vecs.groupBy(_._2).map { case (lab, vs) =>
      lab -> ((vs.length.toLong,
        vs.count(v => droppedIds.contains(v._1)).toLong))
    }
    val got = Ann.semDedup(spark, Sf).collect()
      .map(r => String.valueOf(r.get(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("corpus pipeline: observe census matches independent recomputation") {
    val (corpus, census) = CorpusPipeline.run(spark, Sf)
    val docs = Tables.t(spark, Sf, "documents")
    assert(census.ingested == docs.count())
    val qualityExpected = docs
      .filter(size(split(col("text"), " ")) >= 30).count()
    assert(census.quality == qualityExpected)
    val dedupExpected = docs
      .filter(size(split(col("text"), " ")) >= 30)
      .groupBy(col("text")).agg(min(col("doc_id"))).count()
    assert(census.deduped == dedupExpected)
    assert(census.capped == corpus.count())
    // attrition is monotone and the pipeline never invents rows
    assert(census.ingested >= census.quality &&
      census.quality >= census.deduped && census.deduped >= census.capped)
    // cap honored per source
    assert(corpus.groupBy("source").count().filter(col("count") > 15)
      .count() == 0)
  }

  test("corpus pipeline census rides the plan: no extra scan jobs") {
    // the census must come from observe metrics, not count() re-scans:
    // curate()'s frame carries the three observations, so materializing
    // it ONCE must be enough for the thunk to resolve without running
    // further jobs on this thread
    val (frame, census) = CorpusPipeline.curate(spark, Sf)
    frame.write.mode("overwrite").format("noop").save()
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    val c = census()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    assert(after == before, "census() launched extra jobs")
    assert(c.ingested > 0 && c.quality > 0 && c.deduped > 0)
  }

  test("ccnet buckets: the only window runs over the score histogram, " +
      "never doc rows") {
    // the round-19 shipped shape sorted every scored doc per language
    // (ntile window — superlinear at docs-1000×); the production shape
    // derives the same census from the (lang, score) histogram, so the
    // plan must contain no ntile and its Window input must be the
    // histogram aggregate
    val plan = CorpusOps.ccnetBuckets(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"),
      "per-doc ntile window back in the shipped path")
    val win = plan.indexOf("Window")
    assert(win >= 0, "expected a cumulative-count Window over the histogram")
    // in the top-down plan string, the window's INPUT aggregate appears
    // after it; that aggregate must key on the score histogram
    val agg = plan.indexOf("HashAggregate", win)
    assert(agg > win &&
      plan.substring(agg, math.min(plan.length, agg + 400))
        .contains("score"),
      s"Window input is not the (lang, score) histogram:\n$plan")
  }

  test("ccnet buckets: terciles are near-equal within each language") {
    val r = Materialize.frame(CorpusOps.ccnetBuckets(spark, Sf))
    assert(r.select("bucket").distinct().count() == 3)
    // ntile guarantees bucket sizes within 1 of each other per lang
    val spreadBad = r.groupBy("lang")
      .agg((max("n_docs") - min("n_docs")).as("d"))
      .filter(col("d") > 1).count()
    assert(spreadBad == 0)
    // head outscores tail in every language (scores are avg log-probs)
    val wide = r.groupBy("lang")
      .pivot("bucket", Seq("head", "tail")).sum("avg_score")
    assert(wide.filter(col("head") < col("tail")).count() == 0)
  }
}
