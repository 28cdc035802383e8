package graft

import org.apache.spark.sql.functions._

/** Scratch timing probe for hot-path decomposition (dev tool, not part
  * of the driver contract). Round-22 use: size the candidate-doc set
  * against the corpus — the verify joins exchange every ≥3-token doc's
  * shingle array (docs-1000x trace: 2.2 GB, the family's largest
  * shuffle) even though only candidate-pair members are ever matched. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val docs = Tables.t(spark, dir, "documents")
    val docSh = Dedup.docShFrame(docs).transform(Materialize.frame)
    val nDocs = docSh.count()
    val cand = Dedup.lshCandidates(docSh)
    val candDocs = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().count()
    val nPairs = cand.count()
    println(s"PROBE docs=$nDocs candPairs=$nPairs candDocs=$candDocs " +
      f"frac=${candDocs.toDouble / nDocs}%.4f")
    spark.stop()
  }
}
