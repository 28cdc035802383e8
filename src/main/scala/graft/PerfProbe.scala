package graft

import org.apache.spark.sql.functions._

/** Scratch timing probe for hot-path decomposition (dev tool, not part
  * of the driver contract). Round-22 use: show the STAGE plans that the
  * final explain hides behind checkpoints — the edges-materialize job
  * inside connectedComponents (does lshPairs' presentation Sort survive
  * below the symmetrize explode?) and the curation scored branch. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    // replicate the frame Materialize.frame executes for the edge build
    // (what dedupClusters feeds connectedComponents: the UNSORTED pair
    // pipeline — composing the sorted lshPairs leaves its presentation
    // Sort below the symmetrize Generate)
    val pairs = Dedup.lshPairsFrom(
      Dedup.docShFrame(Tables.t(spark, dir, "documents"))
        .transform(Materialize.frame))
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(explode(array(
      struct(col("doc_a").as("src"), col("doc_b").as("dst")),
      struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    println("===== edges materialize job plan =====")
    edges.explain("formatted")
    spark.stop()
  }
}
