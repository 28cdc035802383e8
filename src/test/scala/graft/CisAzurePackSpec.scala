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

  // --- unconsumed SUPPLEMENTARY_TABLES landing shapes ----------------
  // (azure_collect.py:70) — no pack rule reads these; the specs pin the
  // landing column lists against the reference schema and the
  // cross-shape keys that make them a coherent inventory.

  private def customer = Tables.t(spark, Sf, "customer")

  test("managed_clusters lands the reference column list, one per resource") {
    val mc = AzureCollectViews.managedClusters(supplier)
    assert(mc.columns.toSeq == Seq("recorded_at", "tenant_id",
      "subscription_id", "error", "id", "identity", "location", "name",
      "properties", "tags", "type"))
    assert(mc.count() == supplier.count())
    assert(mc.filter(get_json_object(col("properties"),
      "$.kubernetesVersion").isNull).count() == 0)
  }

  test("resource_groups: two per subscription, ids embed the rg name") {
    val rg = AzureCollectViews.resourceGroups(nation)
    assert(rg.columns.toSeq == Seq("recorded_at", "tenant_id",
      "subscription_id", "error", "id", "location", "managed_by", "name",
      "properties", "tags", "type"))
    assert(rg.count() == 2 * nation.count())
    assert(rg.filter(!col("id").endsWith(col("name"))).count() == 0)
  }

  test("hosting_environments and webapps share the appservice shape") {
    val ase = AzureCollectViews.hostingEnvironments(supplier)
    val app = AzureCollectViews.webapps(supplier)
    assert(ase.columns.toSeq == app.columns.toSeq &&
      ase.columns.toSeq == Seq("recorded_at", "tenant_id",
        "subscription_id", "error", "id", "kind", "location", "name",
        "properties", "tags", "type"))
    // the httpsOnly property is deterministic: false iff suppkey % 4 = 0
    val insecure = app.filter(get_json_object(col("properties"),
      "$.httpsOnly") === "false").count()
    assert(insecure ==
      supplier.filter(col("s_suppkey") % 4 === 0).count())
  }

  test("workflows land per resource group and join back to resource_groups") {
    val wf = AzureCollectViews.workflows(supplier)
    assert(wf.columns.toSeq == Seq("recorded_at", "tenant_id",
      "subscription_id", "resource_group_name", "error", "id", "name",
      "type", "properties"))
    val rg = AzureCollectViews.resourceGroups(nation)
      .select(col("subscription_id"),
        col("name").as("resource_group_name"))
    assert(wf.join(rg, Seq("subscription_id", "resource_group_name"),
      "left_anti").count() == 0,
      "every workflow's (subscription, rg) must exist in resource_groups")
  }

  test("groups carry the full Graph landing list; members join back") {
    val g = AzureCollectViews.groups(customer)
    assert(g.columns.toSeq == Seq("recorded_at", "tenant_id", "error",
      "allow_external_senders", "assigned_licenses",
      "auto_subscribe_new_members", "classification", "created",
      "creation_options", "deleted", "description", "display_name",
      "group_types", "has_members_with_license_errors", "id",
      "is_assignable_to_role", "is_subscribed_by_mail",
      "license_processing_state", "mail", "mail_enabled",
      "mail_nickname", "on_premises_last_sync",
      "on_premises_domain_name", "on_premises_net_bios_name",
      "on_premises_sam_account_name", "resource_behavior_options",
      "resource_provisioning_options", "on_premises_provisioning_errors",
      "on_premises_security_identifier", "on_premises_sync_enabled",
      "preferred_data_location", "proxy_addresses", "renewed",
      "security_enabled", "security_identifier", "unseen_count",
      "visibility", "expiration", "membership_rule",
      "membership_rule_processing_state", "preferred_language", "theme",
      "raw"))
    assert(g.select(col("id")).distinct().count() == 8)
    val gm = AzureCollectViews.groupsMembers(customer)
    assert(gm.count() == customer.count())
    assert(gm.join(g.select(col("id").as("group_id")), Seq("group_id"),
      "left_anti").count() == 0,
      "every member row's group_id must exist in groups")
  }

  test("managed_devices carry the full Intune landing list") {
    val md = AzureCollectViews.managedDevices(customer)
    assert(md.columns.length == 51 &&
      md.columns.take(7).toSeq == Seq("recorded_at", "tenant_id",
        "error", "id", "user_id", "device_name",
        "managed_device_owner_type") &&
      md.columns.takeRight(3).toSeq == Seq("managed_device_name",
        "partner_reported_threat_state", "raw"))
    assert(md.count() == customer.count())
    assert(md.filter(!col("is_encrypted")).count() ==
      customer.filter(col("c_custkey") % 6 === 0).count())
  }

  test("activity_log_alerts land per subscription with parseable properties") {
    val ala = AzureCollectViews.activityLogAlerts(nation)
    assert(ala.columns.toSeq == Seq("recorded_at", "subscription_id",
      "tenant_id", "error", "id", "location", "name", "properties",
      "tags", "type", "kind", "identity"))
    assert(ala.count() == nation.count())
    assert(ala.filter(get_json_object(col("properties"), "$.enabled")
      === "false").count() ==
      nation.filter(col("n_nationkey") % 4 === 0).count())
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
