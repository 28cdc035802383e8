package graft

import org.apache.spark.sql.functions._

/** Parity fuzzing for the fused PiiCounts kernel against the four
  * regexp_count projections it replaced (TextOps.PiiPatterns). The
  * corpus is seeded-deterministic and adversarial for exactly the
  * places a hand-rolled scanner diverges from java.util.regex:
  * word-boundary abuse (digits/letters glued to candidate matches),
  * non-overlap resumption (back-to-back matches with no separator),
  * email domain backtracking (multi-dot domains, digit-polluted TLDs,
  * adjacent '@'s), and over-long digit runs around the {1,3}/{3}/{4}
  * bounds. Every compare is bit-for-bit.
  */
class PiiFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val Atoms = Vector(
    // clean matches of each family
    "bob@example.com", "a@b.co", "user.name+tag@ex-ample.org",
    "x%y_z@mail.co.uk", "1.2.3.4", "10.200.3.255", "999.999.999.999",
    "123-45-6789", "555-123-4567", "555.123.4567", "555.123-4567",
    // near-misses
    "a@b", "a@b.c", "@x.com", "a@@b.com", "a@b..com", "a@b.c3m",
    "a@b-.co", "a@.co", "me@x9.zz", "a@b.co.u8",
    "1234.5.6.7", "1.2.3.4567", "1.2.3.4.5", "1.2.3", "1..2.3.4",
    "1234-56-7890", "123-456-789", "123-45-67890", "123-45_6789",
    "5551234567", "555-1234-567", "55-123-4567x",
    // boundary abuse: word chars glued on either side — including the
    // Java-\b unicode cases: unicode letters ARE word chars without
    // UNICODE_CHARACTER_CLASS, a combining mark is word iff it has a
    // letter/digit base (charwise scan), a lone low surrogate aborts
    // that scan (so a mark over a supplementary-plane letter is
    // non-word)
    "x1.2.3.4", "1.2.3.4x", "_123-45-6789", "123-45-6789_",
    "é1.2.3.4", "字123-45-6789", "😀555-123-4567", "𝔘1.2.3.4",
    "é́1.2.3.4", "́1.2.3.4", "_́123-45-6789",
    "𝔘́1.2.3.4", "123-45-6789́", "1.2.3.4́x",
    "١1.2.3.4", "ß555.123.4567",
    // plain words / noise
    "hello", "a", "zz", "-", ".", "@", "_", "9", "42", "x.y",
    " ", "", "α β")

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    val rand = (1 to n).map { _ =>
      val parts = rng.nextInt(10)
      (0 until parts).map { _ =>
        rng.nextInt(8) match {
          case 0 => " "
          case 1 => "" // direct concatenation — the boundary killer
          case 2 => ","
          case _ => Atoms(rng.nextInt(Atoms.length))
        }
      }.mkString
    }
    val pinned = Seq(
      "", "a@b.coa@b.co", "1.2.3.41.2.3.4", "123-45-6789123-45-6789",
      "555-123-4567555-123-4567", "a@b.co.uk x", "no-reply@sub.dom.io.",
      "ip 1.2.3.4.net", "ssn:123-45-6789.", "t555.123.4567t",
      "a@b.co@c.com", "x@y.zz@w.qq", "1.2.3.4@5.6.7.8",
      "123-45-6789@example.com")
    (pinned ++ rand).distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("fuzz: pii_counts parity with regexp_count on adversarial text") {
    val docs = corpus(20260813L, 1500).toDF("doc_id", "text")
    val pii = graft.functions.text.piiCounts(col("text"))
    val bad = docs.withColumn("__pii", pii)
      .select(
        col("text") +: TextOps.PiiPatterns.map { case (n, pat) =>
          (col(s"__pii.c_$n") <=> regexp_count(col("text"), lit(pat)))
            .as(s"ok_$n")
        }: _*)
      .filter(TextOps.PiiPatterns.map { case (n, _) => !col(s"ok_$n") }
        .reduce(_ || _))
      .collect()
    assert(bad.isEmpty,
      s"pii_counts diverges from regexp_count on:\n${bad.take(10).mkString("\n")}")
  }

  test("piiScan query equals the regexp_count formulation at sf0.001") {
    val fused = TextOps.piiScan(spark, Sf)
    val naive = {
      val counts = TextOps.PiiPatterns.foldLeft(Tables.t(spark, Sf, "documents")) {
        case (df, (name, pat)) =>
          df.withColumn(s"c_$name", regexp_count(col("text"), lit(pat)))
      }
      counts
        .withColumn("flagged",
          TextOps.PiiPatterns.map { case (n, _) => col(s"c_$n") > 0 }
            .reduce(_ || _).cast("int").cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("flagged")).as("n_flagged") +:
            TextOps.PiiPatterns.map { case (n, _) =>
              sum(col(s"c_$n")).cast("long").as(s"n_$n") }: _*)
        .orderBy(col("source"))
    }
    assert(fused.exceptAll(naive).isEmpty && naive.exceptAll(fused).isEmpty,
      "fused piiScan diverges from the regexp_count formulation")
  }
}
