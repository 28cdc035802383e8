package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #26-31: deduplication operators for training-data
  * pipelines. All are composition of built-in codegen'd expressions —
  * signatures are computed in a single projection pass (no shuffle);
  * only candidate generation shuffles, on (band, bucket) keys, so the
  * engine never materializes O(n²) pairs.
  */
object Dedup {
  import Tables.t

  private val NumHashes = 8

  /** Word-level 3-shingles, distinct per doc (one explode, no shuffle
    * until the downstream distinct). */
  def shingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w)-2),
          |  i -> concat_ws(' ', element_at(w,i), element_at(w,i+1),
          |                 element_at(w,i+2)))""".stripMargin)).as("sh"))
      .distinct()

  /** #27 MinHash signatures: k independent hash functions derived from
    * md5 with a per-function salt; min taken per function in ONE
    * aggregation pass (k min-aggregates, map-side combined). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumHashes).map { i =>
      min(md5(concat_ws("", lit(s"$i:"), col("sh")))).as(s"mh$i")
    }
    shingles(s, dir)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** #28 LSH banding (4 bands × 2 rows) → candidate pairs → exact
    * Jaccard on candidates only. */
  def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, dir)
    val bands = sig.select(col("doc_id"), explode(array(
      md5(concat_ws("", lit("0:"), col("mh0"), col("mh1"))),
      md5(concat_ws("", lit("1:"), col("mh2"), col("mh3"))),
      md5(concat_ws("", lit("2:"), col("mh4"), col("mh5"))),
      md5(concat_ws("", lit("3:"), col("mh6"), col("mh7"))))).as("bucket"))
    val cand = bands.as("ba")
      .join(bands.as("bb"),
        col("ba.bucket") === col("bb.bucket") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("doc_a"), col("bb.doc_id").as("doc_b"))
      .distinct()
    val sh = shingles(s, dir)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val inter = sh.as("sa")
      .join(sh.as("sb"),
        col("sa.sh") === col("sb.sh") && col("sa.doc_id") < col("sb.doc_id"))
      .select(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb"), Seq("doc_b"))
      .withColumn("jaccard",
        Num.r4(col("inter") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"),
        col("nb"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** #26 exact dedup after canonicalization (here: first-8-words key —
    * the normalize→hash→groupBy shape of content-defined dedup). */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("key"))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("key"))

  /** #29 character 4-gram Jaccard between adjacent doc pairs (the
    * candidate-pair verification primitive). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "documents")
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)-3), i -> substring(text, i, 4))"))
        .as("g"))
      .distinct()
    val gc = g.groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
    val inter = g.as("ga")
      .join(g.as("gb"),
        col("ga.g") === col("gb.g") &&
          col("gb.doc_id") === col("ga.doc_id") + 1)
      .select(col("ga.doc_id").as("doc_a"), col("gb.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(gc.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("ng", "na"), Seq("doc_a"))
      .join(gc.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("ng", "nb"), Seq("doc_b"))
      .withColumn("jaccard",
        Num.r4(col("inter") / (col("na") + col("nb") - col("inter"))))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"))
  }

  /** #30 32-bit SimHash per doc from token-frequency-weighted md5-derived
    * token hashes (portable bit arithmetic, no UDF). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bits = toks
      .select(col("doc_id"), col("h"),
        explode(expr("sequence(0, 31)")).as("j"))
      .withColumn("v", expr(
        "instr('0123456789abcdef', substr(h, cast(j div 4 as int) + 1, 1)) - 1"))
      .withColumn("p", expr(
        "CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"))
      .withColumn("contrib", expr("2 * ((v div p) % 2) - 1"))
    bits
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("sgn"))
      .withColumn("bit", when(col("sgn") > 0, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(expr("bit * cast(power(2, j) as bigint)")).as("simhash32"))
      .orderBy(col("doc_id"))
  }

  /** #31 embedding-cosine near-duplicate pairs with label blocking
    * (exact arithmetic in double after float→double widening). */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .withColumn("dot",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .withColumn("qa",
        expr("aggregate(transform(va, x -> x * x), 0D, (acc, x) -> acc + x)"))
      .withColumn("qb",
        expr("aggregate(transform(vb, x -> x * x), 0D, (acc, x) -> acc + x)"))
      .withColumn("cosine",
        Num.r4(col("dot") / (sqrt(col("qa")) * sqrt(col("qb")))))
      .filter(col("cosine") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> exactDedup _,
    "q_minhash_signatures" -> ((s: SparkSession, dir: String) =>
      minhashSignatures(s, dir).orderBy(col("doc_id"))),
    "q_dedup_lsh_pairs" -> lshPairs _,
    "q_ngram_jaccard" -> ngramJaccard _,
    "q_dedup_simhash" -> simhash _,
    "q_embedding_neardup" -> embeddingNearDup _
  )

  private val ShinglesCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), pos AS (
      |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
      |  FROM pos
      |), sig AS (
      |  SELECT doc_id,
      |    min(md5('0:' || sh)) AS mh0, min(md5('1:' || sh)) AS mh1,
      |    min(md5('2:' || sh)) AS mh2, min(md5('3:' || sh)) AS mh3,
      |    min(md5('4:' || sh)) AS mh4, min(md5('5:' || sh)) AS mh5,
      |    min(md5('6:' || sh)) AS mh6, min(md5('7:' || sh)) AS mh7
      |  FROM sh GROUP BY doc_id
      |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS key
        |  FROM documents
        |)
        |SELECT key, min(doc_id) AS canonical_doc_id, count(*) AS n_docs
        |FROM keyed GROUP BY key HAVING count(*) >= 2 ORDER BY key""".stripMargin,

    "q_minhash_signatures" ->
      s"$ShinglesCte\nSELECT * FROM sig ORDER BY doc_id",

    "q_dedup_lsh_pairs" ->
      s"""$ShinglesCte, bands AS (
         |  SELECT doc_id, md5('0:' || mh0 || mh1) AS bucket FROM sig
         |  UNION ALL SELECT doc_id, md5('1:' || mh2 || mh3) FROM sig
         |  UNION ALL SELECT doc_id, md5('2:' || mh4 || mh5) FROM sig
         |  UNION ALL SELECT doc_id, md5('3:' || mh6 || mh7) FROM sig
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |), counts AS (
         |  SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT i.doc_a, i.doc_b, i.inter, ca.nsh AS na, cb.nsh AS nb,
         |  round(i.inter / (ca.nsh + cb.nsh - i.inter), 4) AS jaccard
         |FROM inter i
         |JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
         |JOIN counts ca ON ca.doc_id = i.doc_a
         |JOIN counts cb ON cb.doc_id = i.doc_b
         |WHERE round(i.inter / (ca.nsh + cb.nsh - i.inter), 4) >= 0.5
         |ORDER BY i.doc_a, i.doc_b""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, len(text)-3)) AS i
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 4) AS g FROM pos
        |), gc AS (
        |  SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM g a JOIN g b ON a.g = b.g AND b.doc_id = a.doc_id + 1
        |  GROUP BY 1, 2
        |)
        |SELECT i.doc_a, i.doc_b,
        |  round(i.inter / (ca.ng + cb.ng - i.inter), 4) AS jaccard
        |FROM inter i
        |JOIN gc ca ON ca.doc_id = i.doc_a
        |JOIN gc cb ON cb.doc_id = i.doc_b
        |ORDER BY i.doc_a""".stripMargin,

    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id, h, unnest(generate_series(0, 31)) AS j FROM toks
        |), contribs AS (
        |  SELECT doc_id, j,
        |    2 * (((strpos('0123456789abcdef', substr(h, (j // 4) + 1, 1)) - 1)
        |      // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2
        |          ELSE 1 END)) % 2) - 1 AS contrib
        |  FROM bits
        |), sums AS (
        |  SELECT doc_id, j,
        |    CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM contribs GROUP BY doc_id, j
        |)
        |SELECT doc_id,
        |  CAST(sum(bit * CAST(power(2, j) AS BIGINT)) AS BIGINT) AS simhash32
        |FROM sums GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_embedding_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding FROM embeddings
        |), pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    a.embedding AS va, b.embedding AS vb
        |  FROM e a JOIN e b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |), expanded AS (
        |  SELECT vec_a, vec_b, va, vb,
        |    unnest(generate_series(1, len(va))) AS i
        |  FROM pairs
        |), comp AS (
        |  SELECT vec_a, vec_b,
        |    sum(va[i]::DOUBLE * vb[i]::DOUBLE) AS dot,
        |    sum(va[i]::DOUBLE * va[i]::DOUBLE) AS qa,
        |    sum(vb[i]::DOUBLE * vb[i]::DOUBLE) AS qb
        |  FROM expanded GROUP BY vec_a, vec_b
        |)
        |SELECT vec_a, vec_b,
        |  round(dot / (sqrt(qa) * sqrt(qb)), 4) AS cosine
        |FROM comp
        |WHERE round(dot / (sqrt(qa) * sqrt(qb)), 4) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin
  )
}
