package graft.packs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.{RuleEngine, ViolationRule}
import graft.sources.AzureCollectViews

/** The remaining packs/cis_azure_pack.sql rules (the pack's 1.1 / 1.3 /
  * 3.1 canonical instances live in AzureCisPack). Every rule mirrors
  * its reference view's semantics — recorded_at recency windows,
  * QUALIFY latest-snapshot dedup, LATERAL-FLATTEN-derived predicates,
  * left-join coverage checks — over the deterministic AzureCollectViews
  * snapshots, with a full DuckDB hash oracle each.
  *
  * Output is the engine's violation schema with the reference's query
  * ids, titles, and object strings; where a reference object is not
  * unique per violating identity (5.1.4's subscription-level object for
  * per-location identities), the object borrows the pack's own
  * per-location shape (6.5) so identity-hash ids stay distinct — the
  * reference dedups colliding identity hashes at INSERT time.
  *
  * Scale: every input is an inventory dimension (subscriptions,
  * storage accounts, NSG rules, VMs) — orders of magnitude smaller than
  * event streams; joins are dimension×dimension and Catalyst broadcasts
  * them. The only wide rows (policy parameter maps) are pre-projected
  * to the 13 typed columns each rule reads.
  */
object CisAzurePack {
  import Tables.t
  import AzureCollectViews.{W1, W2, W7, latestBy}

  private val Day = "2024-01-30"

  private def vio(name: String, queryId: String, title: String,
      severity: String)(rows: DataFrame, obj: Column): DataFrame =
    RuleEngine.runViolationRule(rows, ViolationRule(
      name = name, queryId = queryId, title = title,
      predicate = lit(true), target = obj,
      owner = lit("devsecops"), severity = lit(severity),
      day = lit(Day).cast("date"))).orderBy(col("id"))

  private def after(w: String): Column =
    col("recorded_at") > lit(w).cast("timestamp")

  /** cis_azure_pack.sql's subscription object, 2.2+ field order:
    * Subscription `sub`, in tenant `t`, named "name". */
  private def subObj: Column = concat_ws("",
    lit("Subscription `"), col("subscription_id"),
    lit("`, in tenant `"), col("tenant_id"),
    lit("`, named \""), col("name"), lit("\""))

  /** 2.1's field order: Subscription `sub`, named "name", in tenant `t`. */
  private def subObj21: Column = concat_ws("",
    lit("Subscription `"), col("subscription_id"),
    lit("`, named \""), col("name"),
    lit("\", in tenant `"), col("tenant_id"), lit("`"))

  /** 5.1.x's object: Subscription `sub`, in tenant `t`. (trailing dot) */
  private def subObjDot: Column = concat_ws("",
    lit("Subscription `"), col("subscription_id"),
    lit("`, in tenant `"), col("tenant_id"), lit("`."))

  // --- 1.23 custom subscription-owner roles -------------------------

  /** cis_azure_pack.sql:169-217 — BOOLOR_AGG over recursively-flattened
    * role-definition property paths: root/subscription assignable scope
    * AND wildcard action, custom roles only. */
  private def customOwnerRoles(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.roleDefinitions(s, dir)
      .groupBy(col("id"), col("tenant_id"), col("subscription_id"),
        col("prop_type"))
      .agg(
        max(when(col("path").rlike("^assignableScopes\\[[0-9]+\\]$") &&
          (col("value") === "/" ||
            col("value").rlike("^/subscriptions/[0-9a-f-]+$")), 1)
          .otherwise(0)).as("root_scope"),
        max(when(
          col("path").rlike("^permissions\\[[0-9]+\\].actions\\[[0-9]+\\]") &&
            col("value") === "*", 1).otherwise(0)).as("all_actions"))
      .filter(col("root_scope") === 1 && col("all_actions") === 1 &&
        col("prop_type") =!= "BuiltInRole")
    vio("azure_cis_1_23", "7MDFB8Z0NKS",
      "Azure CIS 1.23: No custom subscription owner roles are created",
      "High")(
      rows, concat_ws("", col("id"), lit(" in tenant "), col("tenant_id")))
  }

  // --- 2.x security center --------------------------------------------

  /** cis_azure_pack.sql:219-260 CIS 2.1 — non-Standard pricing tier. */
  private def pricingStandard(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.pricings(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col("pricing_tier")).distinct()
      .filter(col("pricing_tier") =!= "Standard")
    vio("azure_cis_2_1", "AY64LVA734B",
      "Azure CIS 2.1: standard pricing tier is selected", "Medium")(
      rows, subObj21)
  }

  /** cis_azure_pack.sql:262-303 CIS 2.2 — auto-provisioning off. */
  private def autoProvisionOn(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.autoProvisioning(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col("auto_provision")).distinct()
      .filter(col("auto_provision") =!= "On")
    vio("azure_cis_2_2", "I9QOIRZ53QG",
      "Azure CIS 2.2: \"Automatic provisioning of monitoring agent\" is set to \"On\"",
      "High")(rows, subObj)
  }

  /** The CIS 2.3-2.15 ASC default-policy family
    * (cis_azure_pack.sql:305-877): rule i reads parameter column i of
    * the policy-assignment view; IFNULL(param,'Disabled')='Disabled'
    * violates. (cisNo, queryId, setting title, parameter column). */
  private val AscSettings: Seq[(String, String, String, String)] = {
    val meta = Seq(
      ("2_3", "6QL7YIUFM6L", "Monitor System Updates"),
      ("2_4", "X52F9H0VP3C", "Monitor OS Vulnerabilities"),
      ("2_5", "E429KPTCRA", "Monitor Endpoint Protection"),
      ("2_6", "BVT8Z6CIGMR", "Monitor Disk Encryption"),
      ("2_7", "M70FBQDUO", "Monitor Network Security Groups"),
      ("2_8", "ZZ7T8U4VXV", "Monitor Web Application Firewall"),
      ("2_9", "NPL91M5IRD", "NGFW Monitoring"),
      ("2_10", "6XQKJV63MGW", "Monitor Vulnerability Assessment"),
      ("2_11", "MIZAVMRZFV", "Monitor Storage Blob Encryption"),
      ("2_12", "0606OV2Q7EP4", "Monitor JIT Network Access"),
      ("2_13", "GCIEER9BOH", "Monitor Adaptive Application Whitelisting"),
      ("2_14", "IDDTR9L5XRK", "Monitor SQL Auditing"),
      ("2_15", "GWYJUFKLHNQ", "Monitor SQL Encryption"))
    meta.zip(AzureCollectViews.MonitoringEffects).map {
      case ((no, qid, setting), param) => (no, qid, setting, param)
    }
  }

  private def ascTitle(no: String, setting: String): String =
    s"""Azure CIS ${no.replace("_", ".")}: ASC Default policy setting "$setting" not "Disabled""""

  private def ascRule(no: String, qid: String, setting: String,
      param: String)(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.policyAssignments(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col(param)).distinct()
      .filter(coalesce(col(param), lit("Disabled")) === "Disabled")
    vio(s"azure_cis_$no", qid, ascTitle(no, setting), "High")(rows, subObj)
  }

  /** cis_azure_pack.sql:879-1052 CIS 2.16-2.19 — security-contact
    * hygiene over the same contacts view. */
  private def contactRule(no: String, qid: String, title: String,
      pred: Column)(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.securityContacts(s, dir)
      .filter(after(W2) && col("type").isNotNull)
      .select(col("tenant_id"), col("subscription_id"), col("name"),
        col("email"), col("phone"), col("alert_notifications"),
        col("alerts_to_admins")).distinct()
      .filter(pred)
    vio(s"azure_cis_$no", qid, title, "High")(rows, subObj)
  }

  // --- 3.x storage ----------------------------------------------------

  /** cis_azure_pack.sql:1099-1142 CIS 3.3 — queue-service logging must
    * cover read+write+delete; QUALIFY latest-snapshot per account. */
  private def queueLogging(s: SparkSession, dir: String): DataFrame = {
    val rows = latestBy(
        AzureCollectViews.Shared.queueServices(s, dir),
        "tenant_id", "subscription_id", "account_name")
      .filter(!(col("logging_read") && col("logging_write") &&
        col("logging_delete")))
    vio("azure_cis_3_3", "15V7N4XMSJE", "Azure CIS 3.3: Storage logging",
      "Medium")(
      rows, concat_ws("", lit("Queue logging in storage account "),
        col("account_name")))
  }

  /** cis_azure_pack.sql:1144-1187 CIS 3.6 — containers with any public
    * access level. */
  private def containerPublic(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared
      .storageContainers(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("container_name"), col("public_access")).distinct()
      .filter(col("public_access").isNotNull)
    vio("azure_cis_3_6", "Y1GWLA9G4K",
      "Azure CIS 3.6: \"Public access level\" is set to Private for blob containers",
      "High")(
      rows, concat_ws("", lit("Storage account \""), col("account_name"),
        lit("\", in container \""), col("container_name"),
        lit("\", in subscription `"), col("subscription_id"),
        lit("`, in tenant `"), col("tenant_id"), lit("`")))
  }

  private def storageObj: Column = concat_ws("",
    lit("Storage account \""), col("account_name"),
    lit("\", in subscription `"), col("subscription_id"),
    lit("`, in tenant `"), col("tenant_id"), lit("`"))

  /** cis_azure_pack.sql:1189-1230 CIS 3.7 — default network access
    * Allow. */
  private def storageNetworkDefault(s: SparkSession, dir: String)
      : DataFrame = {
    val rows = AzureCollectViews.Shared.storageAccounts(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("network_default_action")).distinct()
      .filter(col("network_default_action") === "Allow")
    vio("azure_cis_3_7", "421R8Y8EVAB",
      "Azure CIS 3.7: Storage Account default network access rule should not be \"Allow\"",
      "Medium")(rows, storageObj)
  }

  /** cis_azure_pack.sql:1268-1309 CIS 3.8 — AzureServices bypass not
    * granted (the reference's REGEXP_INSTR word-boundary check). */
  private def storageTrustedServices(s: SparkSession, dir: String)
      : DataFrame = {
    val rows = AzureCollectViews.Shared.storageAccounts(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("network_bypass")).distinct()
      .filter(!col("network_bypass").rlike("\\bAzureServices\\b"))
    vio("azure_cis_3_8", "D4K5N625QNJ",
      "Azure CIS 3.8: \"Trusted Microsoft Services\" is enabled for Storage Account access",
      "Medium")(rows, storageObj)
  }

  // --- 4.1 SQL server -------------------------------------------------

  /** cis_azure_pack.sql:1232-1266 CIS 4.1 — auditing not Enabled. */
  private def sqlAuditing(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared
      .sqlServersAuditing(s, dir)
      .filter(after(W2))
      .select(col("tenant_id"), col("server_full_id"), col("auditing_state"))
      .distinct()
      .filter(col("auditing_state") =!= "Enabled")
    vio("azure_cis_4_1", "E9WUH828JAQ",
      "Azure CIS 4.1: SQL Server Auditing Enabled", "Medium")(
      rows, concat_ws("", lit("SQL Server `"), col("server_full_id"),
        lit("`")))
  }

  // --- 5.1.x log profiles ---------------------------------------------

  private def profiles(s: SparkSession, dir: String): DataFrame =
    AzureCollectViews.Shared.logProfiles(s, dir).filter(after(W1))

  /** cis_azure_pack.sql:1312-1358 CIS 5.1.1 — subscriptions with no log
    * profile (NULL name sentinel rows). */
  private def logProfileExists(s: SparkSession, dir: String): DataFrame =
    vio("azure_cis_5_1_1", "05R5437IZC2F",
      "Azure CIS 5.1.1: Every Subscription should have a Log Profile",
      "High")(profiles(s, dir).filter(col("name").isNull), subObjDot)

  /** cis_azure_pack.sql:1360-1409 CIS 5.1.2 — retention under 365 days
    * where retention is enabled. */
  private def logProfileRetention(s: SparkSession, dir: String): DataFrame =
    vio("azure_cis_5_1_2", "6E90XE64X3K",
      "Azure CIS 5.1.2: Log Profile retention length", "High")(
      profiles(s, dir)
        .filter(col("retention_enabled") && col("retention_days") < 365),
      subObjDot)

  /** cis_azure_pack.sql:1411-1463 CIS 5.1.3 — profiles missing a
    * Write/Delete/Action category. */
  private def logProfileCategories(s: SparkSession, dir: String): DataFrame =
    vio("azure_cis_5_1_3", "2JJNE5ZV9WY",
      "Azure CIS 5.1.3: Log Profile retention categories", "High")(
      profiles(s, dir).filter(col("name").isNotNull &&
        (!array_contains(col("categories"), "Write") ||
          !array_contains(col("categories"), "Delete") ||
          !array_contains(col("categories"), "Action"))),
      subObjDot)

  /** cis_azure_pack.sql:1465-1535 CIS 5.1.4 — subscription locations
    * not covered by any profile's locations array (flattened); the
    * identity is per-location, so the object uses the pack's
    * per-location shape. */
  private def logProfileLocations(s: SparkSession, dir: String): DataFrame = {
    val covered = profiles(s, dir)
      .select(col("tenant_id"), col("subscription_id"),
        explode(col("locations")).as("location_name"))
      .distinct()
      .withColumn("__covered", lit(1))
    val rows = AzureCollectViews.Shared
      .subscriptionLocations(s, dir)
      .join(covered,
        Seq("tenant_id", "subscription_id", "location_name"), "left")
      .filter(col("__covered").isNull)
    vio("azure_cis_5_1_4", "M63QX83WJXL",
      "Azure CIS 5.1.4: Log Profile retention regions", "High")(
      rows, locationObj)
  }

  private def locationObj: Column = concat_ws("",
    lit("Location \""), col("location_name"),
    lit("\", in subscription `"), col("subscription_id"),
    lit("`, in tenant `"), col("tenant_id"), lit("`"))

  /** cis_azure_pack.sql:1537-1595 CIS 5.1.5 — the activity-log
    * container (from the profile's storageAccountId path) is public. */
  private def activityLogContainerPublic(s: SparkSession, dir: String)
      : DataFrame = {
    val lp = profiles(s, dir)
      .filter(col("storage_account_id").isNotNull)
      .select(
        element_at(split(col("storage_account_id"), "/"), 9)
          .as("account_name"),
        lit("insight-operational-logs").as("container_name"))
      .distinct()
    val ct = AzureCollectViews.Shared.storageContainers(s, dir)
      .filter(after(W7))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("container_name"), col("public_access")).distinct()
    val rows = lp.join(ct, Seq("account_name", "container_name"))
      .filter(col("public_access").isNotNull)
    vio("azure_cis_5_1_5", "WE59BTELH49",
      "Azure CIS 5.1.5: storage container storing the activity logs should not be publicly accessible",
      "High")(
      rows, concat_ws("", lit("Container  \""), col("container_name"),
        lit("\""), lit("in Storage Account `"), col("account_name"),
        lit("`, in Subscription `"), col("subscription_id"),
        lit("`, in Tenant `"), col("tenant_id"), lit("`.")))
  }

  /** cis_azure_pack.sql:1597-1656 CIS 5.1.6 — the activity-log storage
    * account is not BYOK-encrypted. */
  private def activityLogByok(s: SparkSession, dir: String): DataFrame = {
    val lp = profiles(s, dir)
      .filter(col("storage_account_id").isNotNull)
      .select(element_at(split(col("storage_account_id"), "/"), 9)
        .as("account_name"))
      .distinct()
    val sa = AzureCollectViews.Shared.storageAccounts(s, dir)
      .filter(after(W7))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("key_source"), col("key_vault_properties")).distinct()
    val rows = lp.join(sa, Seq("account_name"))
      .filter(!(col("key_source") === "Microsoft.Keyvault" &&
        col("key_vault_properties").isNotNull))
    vio("azure_cis_5_1_6", "QC0ASF70MI8",
      "Azure CIS 5.1.6: storage container storing the activity logs should be encrypted with BYOK",
      "High")(
      rows, concat_ws("", lit("Storage Account `"), col("account_name"),
        lit("`, in Subscription `"), col("subscription_id"),
        lit("`, in Tenant `"), col("tenant_id"), lit("`.")))
  }

  /** cis_azure_pack.sql:1658-1726 CIS 5.1.7 — key-vault diagnostic
    * logging absent, wrong category, disabled, or zero retention. */
  private def vaultLogging(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.vaults(s, dir)
      .filter(col("name").isNotNull)
      .join(AzureCollectViews.Shared.diagnosticSettings(s, dir)
        .withColumnRenamed("resource_uri", "vault_id"),
        Seq("vault_id"), "left")
      .filter(col("log_category").isNull ||
        col("log_category") =!= "AuditEvent" || !col("log_enabled") ||
        (col("log_retention_enabled") && col("log_retention_days") === 0))
    vio("azure_cis_5_1_7", "1OMJCL2ANXN",
      "Azure CIS 5.1.7: logging for Azure KeyVault is \"Enabled\"", "High")(
      rows, concat_ws("", lit("Vault `"), col("vault_id"),
        lit("`, in Subscription `"), col("subscription_id"),
        lit("`, in Tenant `"), col("tenant_id"), lit("`.")))
  }

  // --- 6.x networking -------------------------------------------------

  private val OpenPrefixes =
    Seq("*", "0.0.0.0", "<nw>/0", "/0", "internet", "any")

  /** cis_azure_pack.sql:1728-1873 CIS 6.1/6.2 — NSG security rules
    * allowing inbound TCP from the internet to a port (single port or
    * range), over the per-rule flattened landing. */
  private def nsgOpenPort(no: String, qid: String, title: String,
      port: Int)(s: SparkSession, dir: String): DataFrame = {
    val dpr = col("destination_port_range")
    val covers = (dpr === port.toString) ||
      (dpr.contains("-") &&
        split(dpr, "-").getItem(0).cast("int") <= port &&
        split(dpr, "-").getItem(1).cast("int") >= port)
    val rows = AzureCollectViews.Shared
      .networkSecurityGroups(s, dir)
      .filter(after(W2))
      .filter(col("access") === "Allow" && col("direction") === "Inbound" &&
        col("protocol") === "TCP" && covers &&
        col("source_address_prefix").isin(OpenPrefixes: _*))
      .select(col("tenant_id"), col("subscription_id"), col("nsg_name"))
      .distinct()
    vio(s"azure_cis_$no", qid, title, "High")(
      rows, concat_ws("", lit("NSG with the name \""), col("nsg_name"),
        lit("\", in subscription `"), col("subscription_id"),
        lit("`, in tenant `"), col("tenant_id"), lit("`")))
  }

  /** cis_azure_pack.sql:1876-1943 CIS 6.5 — subscription locations
    * without a provisioned Network Watcher. */
  private def networkWatcherCoverage(s: SparkSession, dir: String)
      : DataFrame = {
    val nws = AzureCollectViews.Shared.networkWatchers(s, dir)
      .filter(col("provisioning_state") === "Succeeded")
      .select(col("tenant_id"), col("subscription_id"),
        col("location_name"), col("nw_id"))
    val rows = AzureCollectViews.Shared.subscriptionLocations(s, dir)
      .join(nws, Seq("tenant_id", "subscription_id", "location_name"),
        "left")
      .filter(col("nw_id").isNull)
    vio("azure_cis_6_5", "P5N44TUVJ9N",
      "Azure CIS 6.5: Network Watcher enabled for each Subscription Location",
      "High")(rows, locationObj)
  }

  // --- 7.x virtual machines -------------------------------------------

  private val GoodEncryption = Seq("EncryptionAtRestWithCustomerKey",
    "EncryptionAtRestWithPlatformAndCustomerKeys")

  /** cis_azure_pack.sql:1946-2007 CIS 7.1 — OS disks without
    * customer-key encryption (visibility-gap disks excluded like the
    * reference's disk_id IS NOT NULL workaround). */
  private def osDiskEncrypted(s: SparkSession, dir: String): DataFrame = {
    val dsk = AzureCollectViews.Shared
      .disks(s, dir)
      .select(col("disk_id"), col("encryption_type"))
    val rows = AzureCollectViews.Shared.virtualMachines(s, dir)
      .join(dsk, col("os_disk_id") === col("disk_id"))
      .filter(!col("encryption_type").isin(GoodEncryption: _*))
      .select(col("tenant_id"), col("subscription_id"), col("vm_id"))
      .distinct()
    vio("azure_cis_7_1", "F7HQ2BVPBQG",
      "Azure CIS 7.1: OS Disk must be encrypted", "High")(
      rows, concat_ws("", lit("VM "), col("vm_id")))
  }

  /** cis_azure_pack.sql:2010-2073 CIS 7.2 — any data disk without
    * customer-key encryption (per-element dataDisks landing). */
  private def dataDiskEncrypted(s: SparkSession, dir: String): DataFrame = {
    val dsk = AzureCollectViews.Shared
      .disks(s, dir)
      .select(col("disk_id"), col("encryption_type"))
    val rows = AzureCollectViews.Shared.vmDataDisks(s, dir)
      .join(dsk, col("data_disk_id") === col("disk_id"))
      .filter(!col("encryption_type").isin(GoodEncryption: _*))
      .select(col("tenant_id"), col("subscription_id"), col("vm_id"))
      .distinct()
    vio("azure_cis_7_2", "JF1IPB3TZ",
      "Azure CIS 7.2: Data Disks must be encrypted", "High")(
      rows, concat_ws("", lit("VM "), col("vm_id")))
  }

  /** cis_azure_pack.sql:2075-2117 CIS 7.3 — unattached disks without
    * customer-key encryption. */
  private def unattachedDiskEncrypted(s: SparkSession, dir: String)
      : DataFrame = {
    val rows = AzureCollectViews.Shared
      .disks(s, dir)
      .filter(col("managed_by").isNull &&
        !col("encryption_type").isin(GoodEncryption: _*))
    vio("azure_cis_7_3", "CN4YBO0X01B",
      "Azure CIS 7.3: Unattached disks must be encrypted", "High")(
      rows, concat_ws("", lit("Disk "), col("disk_id")))
  }

  /** cis_azure_pack.sql:2120-2152 CIS 7.4 — unapproved VM extensions
    * (one violation per VM, the reference's identity). */
  private def approvedExtensions(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.vmExtensions(s, dir)
      .filter(col("name").isNotNull &&
        !col("name").isin("LinuxDiagnostic", "AzureNetworkWatcherExtension"))
      .select(col("tenant_id"), col("vm_id")).distinct()
    vio("azure_cis_7_4", "58CYJ8J9MC4",
      "Azure CIS 7.4: Only approved VM extensions installed", "High")(
      rows, col("vm_id"))
  }

  // --- 8.x key vault objects ------------------------------------------

  /** cis_azure_pack.sql:2155-2193 CIS 8.1 — enabled keys without an
    * expiration date (error rows excluded). */
  private def keyExpiration(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.vaultsKeys(s, dir)
      .filter(col("error").isNull && col("enabled") &&
        col("expires").isNull)
    vio("azure_cis_8_1", "J9SXTR77OP",
      "Azure CIS 8.1: Expiration date is set on all keys", "High")(
      rows, concat_ws("", lit("key "), col("key_id")))
  }

  /** cis_azure_pack.sql:2195-2232 CIS 8.2 (the reference titles it
    * "keys" — kept verbatim). */
  private def secretExpiration(s: SparkSession, dir: String): DataFrame = {
    val rows = AzureCollectViews.Shared.vaultsSecrets(s, dir)
      .filter(col("error").isNull && col("enabled") &&
        col("expires").isNull)
    vio("azure_cis_8_2", "HSUI200N9J",
      "Azure CIS 8.2: Expiration date is set on all keys", "High")(
      rows, concat_ws("", lit("secret "), col("secret_id")))
  }

  // --------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_azure_cis_1_23" -> (customOwnerRoles _),
    "q_pack_azure_cis_2_1" -> (pricingStandard _),
    "q_pack_azure_cis_2_2" -> (autoProvisionOn _),
    "q_pack_azure_cis_2_16" -> contactRule("2_16", "JBD8BU7YWHJ",
      "Azure CIS 2.16: security contacts email is set",
      length(col("email")) < 1) _,
    "q_pack_azure_cis_2_17" -> contactRule("2_17", "OL06B7S4S2K",
      "Azure CIS 2.17: security contacts phone number is set",
      length(col("phone")) < 1) _,
    "q_pack_azure_cis_2_18" -> contactRule("2_18", "1URJFBNUAWH",
      "Azure CIS 2.18: \"Send email notification for high severity alerts\" is set to \"On\"",
      col("alert_notifications") =!= "On") _,
    "q_pack_azure_cis_2_19" -> contactRule("2_19", "OZMX8LMRY6E",
      "Azure CIS 2.19: \"Send email also to subscription owners\" is set to \"On\"",
      col("alerts_to_admins") =!= "On") _,
    "q_pack_azure_cis_3_3" -> (queueLogging _),
    "q_pack_azure_cis_3_6" -> (containerPublic _),
    "q_pack_azure_cis_3_7" -> (storageNetworkDefault _),
    "q_pack_azure_cis_3_8" -> (storageTrustedServices _),
    "q_pack_azure_cis_4_1" -> (sqlAuditing _),
    "q_pack_azure_cis_5_1_1" -> (logProfileExists _),
    "q_pack_azure_cis_5_1_2" -> (logProfileRetention _),
    "q_pack_azure_cis_5_1_3" -> (logProfileCategories _),
    "q_pack_azure_cis_5_1_4" -> (logProfileLocations _),
    "q_pack_azure_cis_5_1_5" -> (activityLogContainerPublic _),
    "q_pack_azure_cis_5_1_6" -> (activityLogByok _),
    "q_pack_azure_cis_5_1_7" -> (vaultLogging _),
    "q_pack_azure_cis_6_1" -> nsgOpenPort("6_1", "U2MV5Z68P3C",
      "Azure CIS 6.1: RDP access is restricted from the internet", 3389) _,
    "q_pack_azure_cis_6_2" -> nsgOpenPort("6_2", "OJWU2K5B4WO",
      "Azure CIS 6.2: SSH access is restricted from the internet", 22) _,
    "q_pack_azure_cis_6_5" -> (networkWatcherCoverage _),
    "q_pack_azure_cis_7_1" -> (osDiskEncrypted _),
    "q_pack_azure_cis_7_2" -> (dataDiskEncrypted _),
    "q_pack_azure_cis_7_3" -> (unattachedDiskEncrypted _),
    "q_pack_azure_cis_7_4" -> (approvedExtensions _),
    "q_pack_azure_cis_8_1" -> (keyExpiration _),
    "q_pack_azure_cis_8_2" -> (secretExpiration _)
  ) ++ AscSettings.map { case (no, qid, setting, param) =>
    s"q_pack_azure_cis_$no" -> (ascRule(no, qid, setting, param) _)
  }.toMap

  // --- DuckDB oracles -------------------------------------------------

  /** Violation-row oracle template over a `hits` CTE exposing `obj`.
    * Assembled by plain concatenation — no stripMargin here, because the
    * interpolated fragments are already margin-stripped and a second
    * pass would eat the first `|` of any line-leading `||` concat. */
  private def oSql(name: String, qid: String, title: String, sev: String,
      hitsSql: String): String =
    AzureCollectViews.AzureCtes + ", hits AS (\n" + hitsSql + "\n)\n" +
      s"""SELECT
  md5('$name|' || obj || '|$title|$Day') AS id,
  '$name' AS query_name, '$qid' AS query_id,
  '$title' AS title,
  obj AS object, 'devsecops' AS owner,
  '$sev' AS severity, DATE '$Day' AS violation_day
FROM hits
ORDER BY id"""

  private val SubObjSql =
    """'Subscription `' || subscription_id || '`, in tenant `' ||
      |    tenant_id || '`, named "' || name || '"'""".stripMargin

  private val SubObjDotSql =
    "'Subscription `' || subscription_id || '`, in tenant `' || tenant_id || '`.'"

  private val LocationObjSql =
    """'Location "' || location_name || '", in subscription `' ||
      |    subscription_id || '`, in tenant `' || tenant_id || '`'""".stripMargin

  private val StorageObjSql =
    """'Storage account "' || account_name || '", in subscription `' ||
      |    subscription_id || '`, in tenant `' || tenant_id || '`'""".stripMargin

  private val InW1 = s"recorded_at > TIMESTAMP '$W1'"
  private val InW2 = s"recorded_at > TIMESTAMP '$W2'"
  private val InW7 = s"recorded_at > TIMESTAMP '$W7'"

  def oracle: Map[String, String] = Map(
    "q_pack_azure_cis_1_23" -> oSql("azure_cis_1_23", "7MDFB8Z0NKS",
      "Azure CIS 1.23: No custom subscription owner roles are created",
      "High",
      """  SELECT id || ' in tenant ' || tenant_id AS obj
        |  FROM (
        |    SELECT id, tenant_id, subscription_id, prop_type,
        |      bool_or(regexp_matches(path, '^assignableScopes\[[0-9]+\]$')
        |        AND (value = '/'
        |          OR regexp_matches(value, '^/subscriptions/[0-9a-f-]+$')))
        |        AS root_scope,
        |      bool_or(
        |        regexp_matches(path, '^permissions\[[0-9]+\].actions\[[0-9]+\]')
        |        AND value = '*') AS all_actions
        |    FROM az_roledefs
        |    GROUP BY id, tenant_id, subscription_id, prop_type
        |  )
        |  WHERE root_scope AND all_actions AND prop_type <> 'BuiltInRole'"""
        .stripMargin),

    "q_pack_azure_cis_2_1" -> oSql("azure_cis_2_1", "AY64LVA734B",
      "Azure CIS 2.1: standard pricing tier is selected", "Medium",
      s"""  SELECT 'Subscription `' || subscription_id || '`, named "' ||
         |    name || '", in tenant `' || tenant_id || '`' AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, name, pricing_tier
         |    FROM az_pricings WHERE $InW2
         |  ) WHERE pricing_tier <> 'Standard'""".stripMargin),

    "q_pack_azure_cis_2_2" -> oSql("azure_cis_2_2", "I9QOIRZ53QG",
      "Azure CIS 2.2: \"Automatic provisioning of monitoring agent\" is set to \"On\"",
      "High",
      s"""  SELECT $SubObjSql AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, name, auto_provision
         |    FROM az_autoprov WHERE $InW2
         |  ) WHERE auto_provision <> 'On'""".stripMargin),

    "q_pack_azure_cis_3_3" -> oSql("azure_cis_3_3", "15V7N4XMSJE",
      "Azure CIS 3.3: Storage logging", "Medium",
      """  SELECT 'Queue logging in storage account ' || account_name AS obj
        |  FROM (
        |    SELECT * FROM az_queues
        |    QUALIFY 1 = ROW_NUMBER() OVER (
        |      PARTITION BY tenant_id, subscription_id, account_name
        |      ORDER BY recorded_at DESC)
        |  ) WHERE NOT (logging_read AND logging_write AND logging_delete)"""
        .stripMargin),

    "q_pack_azure_cis_3_6" -> oSql("azure_cis_3_6", "Y1GWLA9G4K",
      "Azure CIS 3.6: \"Public access level\" is set to Private for blob containers",
      "High",
      s"""  SELECT 'Storage account "' || account_name || '", in container "'
         |    || container_name || '", in subscription `' || subscription_id
         |    || '`, in tenant `' || tenant_id || '`' AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, account_name,
         |      container_name, public_access
         |    FROM az_containers WHERE $InW2
         |  ) WHERE public_access IS NOT NULL""".stripMargin),

    "q_pack_azure_cis_3_7" -> oSql("azure_cis_3_7", "421R8Y8EVAB",
      "Azure CIS 3.7: Storage Account default network access rule should not be \"Allow\"",
      "Medium",
      s"""  SELECT $StorageObjSql AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, account_name,
         |      network_default_action
         |    FROM az_storage WHERE $InW2
         |  ) WHERE network_default_action = 'Allow'""".stripMargin),

    "q_pack_azure_cis_3_8" -> oSql("azure_cis_3_8", "D4K5N625QNJ",
      "Azure CIS 3.8: \"Trusted Microsoft Services\" is enabled for Storage Account access",
      "Medium",
      s"""  SELECT $StorageObjSql AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, account_name,
         |      network_bypass
         |    FROM az_storage WHERE $InW2
         |  ) WHERE NOT regexp_matches(network_bypass, '\\bAzureServices\\b')"""
        .stripMargin),

    "q_pack_azure_cis_4_1" -> oSql("azure_cis_4_1", "E9WUH828JAQ",
      "Azure CIS 4.1: SQL Server Auditing Enabled", "Medium",
      s"""  SELECT 'SQL Server `' || server_full_id || '`' AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, server_full_id, auditing_state
         |    FROM az_sql_audit WHERE $InW2
         |  ) WHERE auditing_state <> 'Enabled'""".stripMargin),

    "q_pack_azure_cis_5_1_1" -> oSql("azure_cis_5_1_1", "05R5437IZC2F",
      "Azure CIS 5.1.1: Every Subscription should have a Log Profile",
      "High",
      s"""  SELECT $SubObjDotSql AS obj
         |  FROM az_logprofiles WHERE $InW1 AND name IS NULL""".stripMargin),

    "q_pack_azure_cis_5_1_2" -> oSql("azure_cis_5_1_2", "6E90XE64X3K",
      "Azure CIS 5.1.2: Log Profile retention length", "High",
      s"""  SELECT $SubObjDotSql AS obj
         |  FROM az_logprofiles
         |  WHERE $InW1 AND retention_enabled AND retention_days < 365"""
        .stripMargin),

    "q_pack_azure_cis_5_1_3" -> oSql("azure_cis_5_1_3", "2JJNE5ZV9WY",
      "Azure CIS 5.1.3: Log Profile retention categories", "High",
      s"""  SELECT $SubObjDotSql AS obj
         |  FROM az_logprofiles
         |  WHERE $InW1 AND name IS NOT NULL
         |    AND (NOT list_contains(categories, 'Write')
         |      OR NOT list_contains(categories, 'Delete')
         |      OR NOT list_contains(categories, 'Action'))""".stripMargin),

    "q_pack_azure_cis_5_1_4" -> oSql("azure_cis_5_1_4", "M63QX83WJXL",
      "Azure CIS 5.1.4: Log Profile retention regions", "High",
      s"""  SELECT $LocationObjSql AS obj
         |  FROM az_sublocs l
         |  LEFT JOIN (
         |    SELECT DISTINCT tenant_id AS p_tid, subscription_id AS p_sid,
         |      location_name AS p_loc
         |    FROM (
         |      SELECT tenant_id, subscription_id,
         |        UNNEST(locations) AS location_name
         |      FROM az_logprofiles WHERE $InW1
         |    )
         |  ) p ON p.p_tid = l.tenant_id AND p.p_sid = l.subscription_id
         |    AND p.p_loc = l.location_name
         |  WHERE p.p_loc IS NULL""".stripMargin),

    "q_pack_azure_cis_5_1_5" -> oSql("azure_cis_5_1_5", "WE59BTELH49",
      "Azure CIS 5.1.5: storage container storing the activity logs should not be publicly accessible",
      "High",
      s"""  SELECT 'Container  "' || container_name || '"' ||
         |    'in Storage Account `' || account_name || '`, in Subscription `'
         |    || subscription_id || '`, in Tenant `' || tenant_id || '`.'
         |    AS obj
         |  FROM (
         |    SELECT DISTINCT
         |      string_split(storage_account_id, '/')[9] AS account_name,
         |      'insight-operational-logs' AS container_name
         |    FROM az_logprofiles
         |    WHERE $InW1 AND storage_account_id IS NOT NULL
         |  ) lp
         |  JOIN (
         |    SELECT DISTINCT tenant_id, subscription_id, account_name,
         |      container_name, public_access
         |    FROM az_containers WHERE $InW7
         |  ) ct USING (account_name, container_name)
         |  WHERE public_access IS NOT NULL""".stripMargin),

    "q_pack_azure_cis_5_1_6" -> oSql("azure_cis_5_1_6", "QC0ASF70MI8",
      "Azure CIS 5.1.6: storage container storing the activity logs should be encrypted with BYOK",
      "High",
      s"""  SELECT 'Storage Account `' || account_name ||
         |    '`, in Subscription `' || subscription_id ||
         |    '`, in Tenant `' || tenant_id || '`.' AS obj
         |  FROM (
         |    SELECT DISTINCT
         |      string_split(storage_account_id, '/')[9] AS account_name
         |    FROM az_logprofiles
         |    WHERE $InW1 AND storage_account_id IS NOT NULL
         |  ) lp
         |  JOIN (
         |    SELECT DISTINCT tenant_id, subscription_id, account_name,
         |      key_source, key_vault_properties
         |    FROM az_storage WHERE $InW7
         |  ) sa USING (account_name)
         |  WHERE NOT (key_source = 'Microsoft.Keyvault'
         |    AND key_vault_properties IS NOT NULL)""".stripMargin),

    "q_pack_azure_cis_5_1_7" -> oSql("azure_cis_5_1_7", "1OMJCL2ANXN",
      "Azure CIS 5.1.7: logging for Azure KeyVault is \"Enabled\"", "High",
      """  SELECT 'Vault `' || vault_id || '`, in Subscription `' ||
        |    subscription_id || '`, in Tenant `' || tenant_id || '`.' AS obj
        |  FROM az_vaults v
        |  LEFT JOIN az_diag d ON d.resource_uri = v.vault_id
        |  WHERE v.name IS NOT NULL
        |    AND (d.log_category IS NULL OR d.log_category <> 'AuditEvent'
        |      OR NOT d.log_enabled
        |      OR (d.log_retention_enabled AND d.log_retention_days = 0))"""
        .stripMargin),

    "q_pack_azure_cis_6_5" -> oSql("azure_cis_6_5", "P5N44TUVJ9N",
      "Azure CIS 6.5: Network Watcher enabled for each Subscription Location",
      "High",
      s"""  SELECT $LocationObjSql AS obj
         |  FROM az_sublocs l
         |  LEFT JOIN (
         |    SELECT tenant_id AS w_tid, subscription_id AS w_sid,
         |      location_name AS w_loc, nw_id
         |    FROM az_watchers WHERE provisioning_state = 'Succeeded'
         |  ) w ON w.w_tid = l.tenant_id AND w.w_sid = l.subscription_id
         |    AND w.w_loc = l.location_name
         |  WHERE w.nw_id IS NULL""".stripMargin),

    "q_pack_azure_cis_7_1" -> oSql("azure_cis_7_1", "F7HQ2BVPBQG",
      "Azure CIS 7.1: OS Disk must be encrypted", "High",
      """  SELECT DISTINCT 'VM ' || vm_id AS obj
        |  FROM az_vms v JOIN az_disks d ON d.disk_id = v.os_disk_id
        |  WHERE d.encryption_type NOT IN (
        |    'EncryptionAtRestWithCustomerKey',
        |    'EncryptionAtRestWithPlatformAndCustomerKeys')""".stripMargin),

    "q_pack_azure_cis_7_2" -> oSql("azure_cis_7_2", "JF1IPB3TZ",
      "Azure CIS 7.2: Data Disks must be encrypted", "High",
      """  SELECT DISTINCT 'VM ' || vm_id AS obj
        |  FROM az_vm_disks v JOIN az_disks d ON d.disk_id = v.data_disk_id
        |  WHERE d.encryption_type NOT IN (
        |    'EncryptionAtRestWithCustomerKey',
        |    'EncryptionAtRestWithPlatformAndCustomerKeys')""".stripMargin),

    "q_pack_azure_cis_7_3" -> oSql("azure_cis_7_3", "CN4YBO0X01B",
      "Azure CIS 7.3: Unattached disks must be encrypted", "High",
      """  SELECT 'Disk ' || disk_id AS obj
        |  FROM az_disks
        |  WHERE managed_by IS NULL AND encryption_type NOT IN (
        |    'EncryptionAtRestWithCustomerKey',
        |    'EncryptionAtRestWithPlatformAndCustomerKeys')""".stripMargin),

    "q_pack_azure_cis_7_4" -> oSql("azure_cis_7_4", "58CYJ8J9MC4",
      "Azure CIS 7.4: Only approved VM extensions installed", "High",
      """  SELECT DISTINCT vm_id AS obj
        |  FROM az_vm_ext
        |  WHERE name IS NOT NULL AND name NOT IN (
        |    'LinuxDiagnostic', 'AzureNetworkWatcherExtension')"""
        .stripMargin),

    "q_pack_azure_cis_8_1" -> oSql("azure_cis_8_1", "J9SXTR77OP",
      "Azure CIS 8.1: Expiration date is set on all keys", "High",
      """  SELECT 'key ' || key_id AS obj
        |  FROM az_keys
        |  WHERE error IS NULL AND enabled AND expires IS NULL"""
        .stripMargin),

    "q_pack_azure_cis_8_2" -> oSql("azure_cis_8_2", "HSUI200N9J",
      "Azure CIS 8.2: Expiration date is set on all keys", "High",
      """  SELECT 'secret ' || secret_id AS obj
        |  FROM az_secrets
        |  WHERE error IS NULL AND enabled AND expires IS NULL"""
        .stripMargin)
  ) ++ AscSettings.map { case (no, qid, setting, param) =>
    s"q_pack_azure_cis_$no" -> oSql(s"azure_cis_$no", qid,
      ascTitle(no, setting), "High",
      s"""  SELECT $SubObjSql AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, name, $param
         |    FROM az_policy WHERE $InW2
         |  ) WHERE COALESCE($param, 'Disabled') = 'Disabled'""".stripMargin)
  }.toMap ++ Map(
    "q_pack_azure_cis_2_16" -> contactSql("2_16", "JBD8BU7YWHJ",
      "Azure CIS 2.16: security contacts email is set",
      "length(email) < 1"),
    "q_pack_azure_cis_2_17" -> contactSql("2_17", "OL06B7S4S2K",
      "Azure CIS 2.17: security contacts phone number is set",
      "length(phone) < 1"),
    "q_pack_azure_cis_2_18" -> contactSql("2_18", "1URJFBNUAWH",
      "Azure CIS 2.18: \"Send email notification for high severity alerts\" is set to \"On\"",
      "alert_notifications <> 'On'"),
    "q_pack_azure_cis_2_19" -> contactSql("2_19", "OZMX8LMRY6E",
      "Azure CIS 2.19: \"Send email also to subscription owners\" is set to \"On\"",
      "alerts_to_admins <> 'On'"),
    "q_pack_azure_cis_6_1" -> nsgSql("6_1", "U2MV5Z68P3C",
      "Azure CIS 6.1: RDP access is restricted from the internet", 3389),
    "q_pack_azure_cis_6_2" -> nsgSql("6_2", "OJWU2K5B4WO",
      "Azure CIS 6.2: SSH access is restricted from the internet", 22)
  )

  private def contactSql(no: String, qid: String, title: String,
      where: String): String =
    oSql(s"azure_cis_$no", qid, title, "High",
      s"""  SELECT $SubObjSql AS obj
         |  FROM (
         |    SELECT DISTINCT tenant_id, subscription_id, name, email, phone,
         |      alert_notifications, alerts_to_admins
         |    FROM az_contacts WHERE $InW2 AND type IS NOT NULL
         |  ) WHERE $where""".stripMargin)

  private def nsgSql(no: String, qid: String, title: String,
      port: Int): String =
    oSql(s"azure_cis_$no", qid, title, "High",
      s"""  SELECT DISTINCT 'NSG with the name "' || nsg_name ||
         |    '", in subscription `' || subscription_id ||
         |    '`, in tenant `' || tenant_id || '`' AS obj
         |  FROM az_nsg
         |  WHERE $InW2
         |    AND access = 'Allow' AND direction = 'Inbound'
         |    AND protocol = 'TCP'
         |    AND (destination_port_range = '$port'
         |      OR (contains(destination_port_range, '-')
         |        AND CAST(string_split(destination_port_range, '-')[1]
         |          AS INTEGER) <= $port
         |        AND CAST(string_split(destination_port_range, '-')[2]
         |          AS INTEGER) >= $port))
         |    AND source_address_prefix IN (
         |      '*', '0.0.0.0', '<nw>/0', '/0', 'internet', 'any')"""
        .stripMargin)
}
