package graft

import org.apache.spark.sql.functions._

import graft.sources.AzureCollectViews
import graft.sources.AzureCollectViews.{D1, D2}

/** CIS Azure pack semantics (VERDICT r5 item 4): the azure_collect
  * views plant a stale D1 snapshot whose values violate every rule —
  * these tests prove the traps are ARMED (D1 rows exist and violate)
  * and that the rules DEFUSE them (recorded_at recency windows, QUALIFY
  * latest-snapshot dedup), so a rule that forgot its window or dedup
  * could not pass its oracle by accident.
  */
class CisAzurePackSpec extends SparkSuite {

  private def nation = Tables.t(spark, Sf, "nation")
  private def supplier = Tables.t(spark, Sf, "supplier")
  private def q(name: String): Long =
    graft.packs.CisAzurePack.queries(name)(spark, Sf).count()

  private val stale = col("recorded_at") === lit(D1).cast("timestamp")
  private val latest = col("recorded_at") === lit(D2).cast("timestamp")

  test("stale-snapshot trap is armed: every D1 pricing row violates") {
    val p = AzureCollectViews.pricings(spark, nation)
    val n = p.filter(stale).count()
    assert(n > 0, "no stale snapshot landed — trap unarmed")
    assert(p.filter(stale && col("pricing_tier") =!= "Standard").count() == n,
      "stale rows must all violate, else the trap can't catch a missing window")
  }

  test("CIS 2.1 honors its recency window: only D2 violations surface") {
    val p = AzureCollectViews.pricings(spark, nation)
    val expected = p.filter(latest && col("pricing_tier") =!= "Standard").count()
    val windowless = p.filter(col("pricing_tier") =!= "Standard")
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col("pricing_tier")).distinct().count()
    assert(q("q_pack_azure_cis_2_1") == expected)
    assert(windowless > expected,
      "dropping the recency filter must change the result (trap fires)")
  }

  test("CIS 2.2 honors its recency window: stale all-Off rows excluded") {
    val a = AzureCollectViews.autoProvisioning(spark, nation)
    val expected = a.filter(latest && col("auto_provision") =!= "On").count()
    val windowless = a.filter(col("auto_provision") =!= "On")
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col("auto_provision")).distinct().count()
    assert(q("q_pack_azure_cis_2_2") == expected)
    assert(windowless > expected,
      "dropping the recency filter must change the result (trap fires)")
  }

  test("CIS 3.3 latest-dedups queue snapshots (QUALIFY row_number shape)") {
    val qs = AzureCollectViews.queueServices(spark, supplier)
    val bad = !(col("logging_read") && col("logging_write") &&
      col("logging_delete"))
    val expected = qs.filter(latest && bad).count()
    val undeduped = qs.filter(bad).count()
    assert(q("q_pack_azure_cis_3_3") == expected)
    assert(undeduped > expected,
      "stale queue rows (all-false logging) must exist so a missing " +
        "latest-dedup would double-count")
  }
}
