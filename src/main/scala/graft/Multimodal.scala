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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> decodeMeta _
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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
