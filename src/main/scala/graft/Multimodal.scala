package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #39: multimodal column plumbing. Media are opaque
  * `binary` columns with a typed metadata struct; decode runs batched
  * per partition (the Scala analogue of a mapInPandas batch UDF). The
  * decoder itself is STUBBED — no image/audio libs in this container —
  * with a deterministic fake that maps bytes → (width, height, frames),
  * so the Spark-side plumbing (schema, partitioning, batch shape) is
  * real and tested while the codec is swappable.
  */
object Multimodal {

  /** Deterministic fake decode; swap for a real codec (e.g. javax
    * ImageIO / JNI ffmpeg) without touching the plan shape. */
  private def stubDecode(bytes: Array[Byte]): (Long, Long, Long) = {
    val n = bytes.length
    (64L + n % 512, 64L + (n * 31) % 512, n / 1024L + 1L)
  }

  /** Binary payload + metadata struct + batched decode. */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = Tables.t(s, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("image/fake").as("mime"),
          length(col("text")).cast("long").as("n_bytes")).as("meta"))
    bin.select(col("doc_id"), col("payload"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, nBytes) =>
          val (w, h, frames) = stubDecode(bytes)
          (id, nBytes, w, h, frames)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "n_frames")
      .orderBy(col("doc_id"))
  }

  /** #67 frame sampling over a binary payload: fixed-size frames, every
    * `Stride`-th sampled — the video/audio pre-processing shape (pick
    * keyframes / chunk audio for ASR) with NO codec involved: byte
    * arithmetic only, so it is fully real, not a stub. The per-frame
    * hashes are computed by a `transform` over the frame-index sequence
    * INSIDE one projection, and only (idx, md5) structs are exploded —
    * the payload itself is never duplicated per frame, which is the
    * difference between shipping 32-byte digests and re-shuffling the
    * whole 100 TB blob column. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val FrameBytes = 32
    val Stride = 4
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("nf",
        (length(col("payload")) / FrameBytes).cast("long"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), expr(
        s"""transform(sequence(0L, nf-1, $Stride),
           |  i -> struct(i AS frame_idx,
           |    md5(substring(payload, cast(i*$FrameBytes+1 AS int),
           |        $FrameBytes)) AS frame_md5))""".stripMargin).as("fr"))
      .select(col("doc_id"), explode(col("fr")).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame_md5").as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** #39b perceptual near-dup pairs over BINARY payloads
    * `q_media_phash_dedup` — the image/video dedup shape: a 32-bit
    * byte-domain dHash per payload (the fused
    * [[graft.functions.PHash32]] kernel: 33 evenly-spaced byte
    * samples, bit = sample&gt;next; a real perceptual hash swaps the
    * byte stream for decoded pixels — the stubbed-decode convention —
    * with the plan unchanged), then EXACTLY the SimHash pair
    * machinery: 4×8-bit band bucketing → candidate pairs only →
    * bit_count(xor) ≤ 3 hamming verify. The blob column dies at the
    * scan — only (doc_id, 32-bit hash) rows ever shuffle, which is
    * the difference between banding 8-byte signatures and re-shuffling
    * 100 TB of media. Hot buckets capped like every bucket join. */
  def mediaPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val ph = Tables.t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .filter(length(col("payload")) >= 33)
      .select(col("doc_id"),
        graft.functions.hashes.pHash32(col("payload")).as("h"))
      .transform(graft.Materialize.frame)
    val keyed = Dedup.dropHotBuckets(
      ph.select(col("doc_id"), col("h"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("key", expr(
          "(h div cast(power(2, band * 8) as bigint)) % 256")),
      Seq("band", "key"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> decodeMeta _,
    "q_frame_sample" -> frameSample _,
    "q_media_phash_dedup" -> mediaPhashDedup _
  )

  /** The stub decode is pure byte arithmetic, so even the decode path
    * gets a full hash-checked oracle (a real codec would fall back to a
    * rows+schema check). */
  def oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 512 AS BIGINT)
        |    AS height,
        |  CAST(octet_length(encode(text)) // 1024 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the payload is UTF-8 of ascii text, so byte slicing == char
    // slicing and the oracle can hash string substrings
    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text, len(text) // 32 AS nf
        |  FROM documents WHERE len(text) >= 32
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(substring(text, CAST(i*32+1 AS INTEGER), 32)) AS frame_md5
        |FROM f, UNNEST(range(0, nf, 4)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // same ascii-payload identity as frame_sample: byte j of the
    // UTF-8 payload == char j+1 of the text, so ascii(substring())
    // reproduces the kernel's unsigned byte compares exactly
    "q_media_phash_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 33
        |), ph AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN
        |      ascii(substring(text, CAST((j*n)//33 AS INTEGER)+1, 1)) >
        |      ascii(substring(text, CAST(((j+1)*n)//33 AS INTEGER)+1, 1))
        |    THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS h
        |  FROM d, UNNEST(range(0, 32)) t(j)
        |  GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, h, b,
        |    (h // CAST(power(2, b*8) AS BIGINT)) % 256 AS key
        |  FROM ph, UNNEST(range(0, 4)) t(b)
        |), sized AS (
        |  SELECT b, key FROM bands GROUP BY b, key
        |  HAVING count(*) <= 100
        |), keyed AS (
        |  SELECT bands.* FROM bands JOIN sized USING (b, key)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.h AS ha, b.h AS hb
        |  FROM keyed a JOIN keyed b
        |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}
