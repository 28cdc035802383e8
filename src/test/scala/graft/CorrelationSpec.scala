package graft

import org.apache.spark.sql.functions._

import graft.engine.RuleEngine

/** Pins the semantic relationship between the two correlation
  * implementations against the reference (alert_processor.py:11-40):
  * gap-sessionization (`correlate`) chains only via the immediately
  * previous alert; the reference's most-recent-match rule
  * (`correlateAnchored`) looks back through the whole window. They agree
  * on uninterrupted chains and diverge exactly when an unrelated alert
  * interleaves. */
class CorrelationSpec extends SparkSuite {
  import spark.implicits._

  private def alert(id: String, actor: String, obj: String, action: String,
      tMin: Long) =
    (id, actor, obj, action, tMin * 60L)

  private def df(rows: (String, String, String, String, Long)*) =
    rows.toSeq
      .toDF("alert_id", "actor", "object", "action", "event_time_s")

  test("both implementations agree on an uninterrupted chain") {
    val alerts = df(
      alert("a1", "u1", "X", "read", 0),
      alert("a2", "u1", "X", "write", 30), // same object, chains
      alert("a3", "u1", "Z", "write", 55), // same action as a2, chains
      alert("b1", "u1", "Q", "other", 300)) // far away: new chain
    val gap = RuleEngine.correlate(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for (m <- Seq(gap, anch)) {
      assert(m("a1") == m("a2") && m("a2") == m("a3"))
      assert(m("b1") != m("a1"))
    }
  }

  test("array-valued object/action correlate by whole-array equality " +
      "(reference regression SP1513)") {
    // The reference fixed array actions by serializing the list and
    // comparing alert:ACTION::STRING for WHOLE-ARRAY equality
    // (alert_processor.py:50-57 + tests/regression/
    // SP1513_correlating_array_actions.py). graft's flat schema gets
    // the same semantics for free: a rule emitting array fields
    // serializes them into the string columns, and === compares the
    // whole serialization. Mirror of the regression scenario: objects
    // DIFFER (["obj1","obj2"] vs ["obj1"]) but actions are the same
    // array — the pair must share a correlation id via the action leg.
    val alerts = df(
      alert("A", "Test Actor", """["obj1","obj2"]""",
        """["act1","act2"]""", 0),
      alert("B", "Test Actor", """["obj1"]""",
        """["act1","act2"]""", 5),
      // control: same actor, both legs differ → no correlation
      alert("C", "Test Actor", """["obj9"]""", """["act9"]""", 10))
    for (m <- Seq(
      RuleEngine.correlate(alerts, 60),
      RuleEngine.correlateAnchored(alerts, 60))
        .map(_.select("alert_id", "correlation_id").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap)) {
      assert(m("A") == m("B"), "identical action arrays must correlate")
      assert(m("C") != m("A"), "disjoint arrays must not correlate")
    }
  }

  test("divergence: an interleaved unrelated alert splits the session " +
      "but not the reference's anchored chain") {
    // A(obj=X) .. B(obj=Y, unrelated) .. C(obj=X): the reference's
    // GET_CORRELATED_ALERT looks past B (most recent alert matching
    // C's object within 60 min is A) — gap-sessionization breaks at B.
    val alerts = df(
      alert("A", "u1", "X", "read", 0),
      alert("B", "u1", "Y", "other", 30),
      alert("C", "u1", "X", "read", 50))

    val gap = RuleEngine.correlate(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // sessionization: three separate chains (B broke the adjacency)
    assert(gap("A") != gap("C"))
    assert(gap("A") != gap("B") && gap("B") != gap("C"))

    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // reference semantics: C correlates with A across B; B stands alone
    assert(anch("A") == anch("C"))
    assert(anch("B") != anch("A"))
  }

  test("anchored window is per-alert lookback, not chain-relative") {
    // A at t=0, C at t=90: outside C's 60-min lookback even though both
    // share an object — no chain (the reference's DATEADD window is
    // anchored to the candidate alert's own event time)
    val alerts = df(
      alert("A", "u1", "X", "read", 0),
      alert("C", "u1", "X", "read", 90))
    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(anch("A") != anch("C"))
  }

  test("bucketed candidate join still chains across a bucket boundary") {
    // W = 3600 s: A at t=3500 (bucket 0) and C at t=3700 (bucket 1) are
    // 200 s apart — the probe side's adjacent-bucket duplication must
    // find A even though floor(t/W) differs
    val alerts = df(
      ("A", "u1", "X", "read", 3500L),
      ("C", "u1", "X", "read", 3700L))
    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(anch("A") == anch("C"))
  }

  test("hot actor-bucket cap drops parents, alerts root their own chains") {
    // three same-object alerts in one bucket: with the cap at 2 the
    // bucket's parents are dropped, so no alert finds a parent — each
    // roots its own chain (degenerate-skew hygiene, off by default)
    val alerts = df(
      alert("A", "u1", "X", "read", 0),
      alert("B", "u1", "X", "read", 5),
      alert("C", "u1", "X", "read", 10))
    val capped = RuleEngine.correlateAnchored(alerts, 60,
        maxActorBucketAlerts = 2)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(capped.values.toSet.size == 3)
    val uncapped = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(uncapped.values.toSet.size == 1)
  }

  test("actors never share chains in either implementation") {
    val alerts = df(
      alert("A", "u1", "X", "read", 0),
      alert("B", "u2", "X", "read", 10))
    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(anch("A") != anch("B"))
  }

  /** O(n²) in-memory transcription of the reference loop
    * (alert_processor.py:11-40): most recent prior same-actor alert
    * within the gap sharing object or action; chains resolve to their
    * transitive root. The distributed bucket-join + pointer-jumping
    * implementation must partition alerts into exactly these chains. */
  private def bruteChains(
      rows: Seq[(String, String, String, String, Long)],
      gapS: Long): Set[Set[String]] = {
    val parent = scala.collection.mutable.Map[String, String]()
    for (a <- rows) {
      val cands = rows.filter(p =>
        p._2 == a._2 &&
          (p._5 < a._5 || (p._5 == a._5 && p._1 < a._1)) &&
          a._5 - p._5 <= gapS &&
          (p._3 == a._3 || p._4 == a._4))
      if (cands.nonEmpty)
        parent(a._1) = cands.maxBy(p => (p._5, p._1))._1
    }
    @annotation.tailrec
    def root(id: String): String =
      parent.get(id) match {
        case Some(p) => root(p)
        case None => id
      }
    rows.groupBy(r => root(r._1)).values.map(_.map(_._1).toSet).toSet
  }

  test("a deep chain resolves to one root through the pointer-jump loop") {
    // 13 alerts, 5 min apart, same object: every alert's most-recent
    // match is its immediate predecessor, so the parent forest is a
    // PATH of depth 12 — past the 3-hop fused seed, forcing ≥ 2
    // doubling rounds of the loop (3 → 6 → 12). Plus an unrelated
    // second actor to keep the final left join honest.
    val chain = (0 until 13).map(i =>
      alert(f"c$i%02d", "u1", "X", "read", i * 5L))
    val alerts = df(chain :+ alert("z1", "u2", "Q", "other", 10L): _*)
    val anch = RuleEngine.correlateAnchored(alerts, 60)
      .select("alert_id", "correlation_id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(chain.map(c => anch(c._1)).toSet.size == 1,
      "every chain member must carry the root's correlation id")
    assert(anch("z1") != anch("c00"))
  }

  test("randomized: anchored chains match the brute-force reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(15)
      val rows = (0 until n).map { i =>
        (f"a$i%03d",
          s"u${rnd.nextInt(3)}",
          s"obj${rnd.nextInt(3)}",
          s"act${rnd.nextInt(3)}",
          rnd.nextInt(10800).toLong) // 3h span vs 60-min gap
      }
      val expected = bruteChains(rows, 3600L)
      val got = RuleEngine.correlateAnchored(df(rows: _*), 60)
        .select("alert_id", "correlation_id").collect()
        .groupBy(_.getString(1)).values.map(_.map(_.getString(0)).toSet)
        .toSet
      assert(got == expected, s"trial $trial: chains diverge\n" +
        s"rows=$rows\nexpected=$expected\ngot=$got")
    }
  }
}
