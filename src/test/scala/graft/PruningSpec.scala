package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #43: date-partitioned event source — proves (not just
  * claims) that a from/to-windowed rule scans only matching partitions,
  * via the executed plan's partition filters and file-count metric. */
class PruningSpec extends SparkSuite {

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    def unwrap(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(unwrap)
    }
    unwrap(df.queryExecution.executedPlan).head
  }

  test("time-windowed read prunes to matching date partitions") {
    val out = Files.createTempDirectory("graft-part")
      .resolve("events").toString
    Tables.writePartitionedEvents(spark, Sf, out)

    val all = Tables.partitionedEvents(spark, out)
    val nDates = all.select("date").distinct().count()
    assert(nDates > 5) // sf0.001 spans most of Jan 2024

    val windowed = Tables.timeWindow(
      Tables.partitionedEvents(spark, out),
      "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val rows = windowed.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val t = r.getAs[java.sql.Timestamp]("ts")
      !t.before(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
        t.before(java.sql.Timestamp.valueOf("2024-01-12 00:00:00"))
    })

    val scan = scanOf(windowed)
    // the date predicate reached the scan as a partition filter...
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.partitionFilters.mkString(",").contains("date"))
    // ...and only the 3 candidate date directories were read (the ts
    // range touches at most 2024-01-10/11/12), not all ~31
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = all.inputFiles.length.toLong
    assert(filesRead <= 3)
    assert(filesRead < filesTotal)
    // the ts predicate is pushed to the parquet reader for row-group
    // skipping within the surviving partitions
    assert(scan.dataFilters.mkString(",").contains("ts"))
  }

  test("corpus selection ops column-prune the text payload at the scan") {
    // the text column is the 100 TB of a documents table; operators
    // that only SELECT docs (not read them) must never deserialize it
    for (name <- Seq("q_domain_cap", "q_corpus_sample", "q_leakage_split")) {
      val scan = scanOf(SparkEntry.queries(name)(spark, Sf))
      val cols = scan.schema.fieldNames.toSet
      assert(!cols.contains("text"),
        s"$name reads the text payload: ${cols.mkString(",")}")
    }
    // the pipeline needs text once (for the gate + hash) but its
    // windows must not carry it — checked in PlanShapeSpec; here:
    // the chunk op reads ONLY text + source
    val chunkScan = scanOf(SparkEntry.queries("q_doc_chunk")(spark, Sf))
    assert(chunkScan.schema.fieldNames.toSet == Set("text", "source"))
  }
}
