package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic `azure_collect_*` snapshot views for the CIS Azure pack
  * (reference: src/connectors/azure_collect.py landing tables,
  * packs/cis_azure_pack.sql rule inputs). Like AwsCollectViews, each
  * view derives deterministically from the TPC-H-ish test tables
  * (`nation` = subscription universe, `supplier` = storage/SQL/network
  * resources, `customer` = VMs/keys/secrets).
  *
  * Views whose reference rules filter `recorded_at > CURRENT_DATE - N`
  * carry TWO snapshots: D2 (inside every rule window — the graded
  * truth) and D1 (ten days stale, outside every window, all-violating
  * values) — a rule that forgets the recency filter reads both and
  * fails its hash oracle. Views whose rules dedup with QUALIFY
  * row_number (queue services) carry both snapshots too and must be
  * latest-deduped. Purely-dimensional views (VMs, disks, key-vault
  * objects, role definitions) land the latest snapshot only.
  *
  * VARIANT arrays the reference flattens with LATERAL FLATTEN (NSG
  * securityRules, VM dataDisks, role-definition property paths) are
  * landed one row per element — the post-flatten shape — while real
  * array columns (log-profile categories/locations) stay arrays and
  * are flattened in the rules, exercising both shapes.
  */
object AzureCollectViews {

  /** Stale snapshot — outside every rule's recorded_at window. */
  val D1 = "2024-01-20 00:00:00"
  /** Latest snapshot — inside every rule's window. */
  val D2 = "2024-01-30 00:00:00"

  /** Rule-window start instants (run instant 2024-01-30 12:00:00 minus
    * 1/2/7 days — the windows cis_azure_pack.sql derives from
    * CURRENT_DATE/CURRENT_TIMESTAMP). */
  val W1 = "2024-01-29 12:00:00"
  val W2 = "2024-01-28 12:00:00"
  val W7 = "2024-01-23 12:00:00"

  /** The 13 ASC default-policy monitoring-effect parameters of CIS
    * 2.3-2.15 (cis_azure_pack.sql:346-874, properties:parameters keys),
    * landed as snake_case typed columns in rule order. */
  val MonitoringEffects: Seq[String] = Seq(
    "system_updates", "system_configurations", "endpoint_protection",
    "disk_encryption", "network_security_groups",
    "web_application_firewall", "next_generation_firewall",
    "vulnerability_assesment", "storage_encryption", "jit_network_access",
    "adaptive_application_controls", "sql_auditing", "sql_encryption")
    .map(_ + "_monitoring_effect")

  private def withSnapshots(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.crossJoin(
      Seq(D1, D2).toDF("__snap")
        .select(col("__snap").cast("timestamp").as("recorded_at")))
  }

  private def isLatest: Column =
    col("recorded_at") === lit(D2).cast("timestamp")

  /** Keep each key's most recent snapshot (rank keeps multi-row
    * landings whole) — the QUALIFY row_number shape. */
  def latestBy(df: DataFrame, keys: String*): DataFrame =
    df.withColumn("__rk",
        rank().over(Window.partitionBy(keys.map(col): _*)
          .orderBy(col("recorded_at").desc)))
      .filter(col("__rk") === 1).drop("__rk")

  private def sub(k: Column): Column = concat_ws("", lit("sub-"), k)
  private def ten(k: Column): Column = concat_ws("", lit("t"), k % 3)

  /** azure_collect_pricings (CIS 2.1): one security-center pricing row
    * per subscription; stale snapshot all-Free. */
  def pricings(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation).select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      lit("default").as("name"), col("recorded_at"),
      when(isLatest, when(k % 3 === 0, "Free").otherwise("Standard"))
        .otherwise("Free").as("pricing_tier"))
  }

  /** azure_collect_auto_provisioning_settings (CIS 2.2); stale all-Off. */
  def autoProvisioning(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation).select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      lit("default").as("name"), col("recorded_at"),
      when(isLatest, when(k % 4 === 0, "Off").otherwise("On"))
        .otherwise("Off").as("auto_provision"))
  }

  /** azure_collect_policy_assignments (CIS 2.3-2.15): the 13
    * monitoring-effect parameters as typed columns (the post-extract
    * shape of properties:parameters); stale snapshot all-Disabled. */
  def policyAssignments(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    val effects = MonitoringEffects.zipWithIndex.map { case (p, i) =>
      when(isLatest,
        when((k + i) % 4 === 0, "Disabled")
          .when((k + i) % 4 === 1, lit(null))
          .otherwise("Audit"))
        .otherwise("Disabled").as(p)
    }
    withSnapshots(s, nation).select(
      Seq(ten(k).as("tenant_id"), sub(k).as("subscription_id"),
        lit("SecurityCenterBuiltIn").as("name"), col("recorded_at")) ++
        effects: _*)
  }

  /** azure_collect_security_contacts (CIS 2.16-2.19): null-type rows
    * excluded by the rules; stale snapshot all-violating. */
  def securityContacts(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation).select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      lit("default1").as("name"), col("recorded_at"),
      when(k % 7 === 0, lit(null))
        .otherwise(lit("Microsoft.Security/securityContacts")).as("type"),
      when(isLatest, when(k % 3 === 0, "").otherwise("sec@corp.example"))
        .otherwise("").as("email"),
      when(isLatest, when(k % 4 === 0, "").otherwise("+1-555-0100"))
        .otherwise("").as("phone"),
      when(isLatest, when(k % 5 === 0, "Off").otherwise("On"))
        .otherwise("Off").as("alert_notifications"),
      when(isLatest, when(k % 6 === 0, "Off").otherwise("On"))
        .otherwise("Off").as("alerts_to_admins"))
  }

  /** azure_collect_storage_accounts (CIS 3.1/3.7/3.8/5.1.6): one
    * account per supplier; typed post-extract property columns. */
  def storageAccounts(s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier).select(
      ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
      concat_ws("", lit("sa"), k).as("account_name"),
      concat_ws("", lit("/subscriptions/sub-"), k % 25,
        lit("/resourceGroups/rg"), k,
        lit("/providers/Microsoft.Storage/storageAccounts/sa"), k)
        .as("account_id"),
      lit("StorageV2").as("kind"), col("recorded_at"),
      when(isLatest, k % 3 =!= 0).otherwise(lit(false))
        .as("supports_https_traffic_only"),
      when(isLatest, when(k % 4 === 0, "Allow").otherwise("Deny"))
        .otherwise("Allow").as("network_default_action"),
      when(isLatest,
        when(k % 5 === 0, "None")
          .when(k % 5 === 1, "AzureServices, Logging")
          .otherwise("AzureServices"))
        .otherwise("None").as("network_bypass"),
      when(isLatest,
        when(k % 3 === 1, "Microsoft.Storage")
          .otherwise("Microsoft.Keyvault"))
        .otherwise("Microsoft.Storage").as("key_source"),
      when(isLatest && k % 3 === 0, concat_ws("", lit("kv"), k))
        .as("key_vault_properties"))
  }

  /** azure_collect_storage_accounts_containers (CIS 3.6/5.1.5): two
    * containers per account; even suppliers host the
    * insight-operational-logs activity-log container. */
  def storageContainers(s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier)
      .select(ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
        concat_ws("", lit("sa"), k).as("account_name"), col("recorded_at"),
        k.as("__k"), explode(array(lit(0), lit(1))).as("__i"))
      .select(col("tenant_id"), col("subscription_id"), col("account_name"),
        col("recorded_at"),
        when(col("__i") === 0,
          when(col("__k") % 2 === 0, "insight-operational-logs")
            .otherwise("data0"))
          .otherwise(concat_ws("", lit("logs"), col("__k")))
          .as("container_name"),
        when(isLatest,
          when((col("__k") + col("__i")) % 3 === 0, "Container"))
          .otherwise("Container").as("public_access"))
  }

  /** azure_collect_queue_services_properties (CIS 3.3): logging flags;
    * stale snapshot all-false — the rule must QUALIFY-dedup to the
    * latest row per account. */
  def queueServices(s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier).select(
      ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
      concat_ws("", lit("sa"), k).as("account_name"), col("recorded_at"),
      when(isLatest, k % 3 =!= 0).otherwise(lit(false)).as("logging_read"),
      when(isLatest, k % 4 =!= 0).otherwise(lit(false)).as("logging_write"),
      when(isLatest, k % 5 =!= 0).otherwise(lit(false)).as("logging_delete"))
  }

  /** azure_collect_sql_servers_auditing_settings (CIS 4.1); the rule
    * regexp-extracts the subscription from the full resource id. */
  def sqlServersAuditing(s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier).select(
      ten(k % 25).as("tenant_id"), col("recorded_at"),
      concat_ws("", lit("/subscriptions/sub-"), k % 25,
        lit("/resourceGroups/rg"), k,
        lit("/providers/Microsoft.Sql/servers/sqlsrv"), k)
        .as("server_full_id"),
      when(isLatest, when(k % 3 === 1, "Disabled").otherwise("Enabled"))
        .otherwise("Disabled").as("auditing_state"))
  }

  /** azure_collect_log_profiles (CIS 5.1.1-5.1.6): every-fifth
    * subscription has none (NULL name); categories/locations stay
    * ARRAY columns (flattened in the rules); storage_account_id points
    * at the sa1..sa10 storage accounts. */
  def logProfiles(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    withSnapshots(s, nation).select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      concat_ws("", lit("lp-"), k).as("log_profile_id"), col("recorded_at"),
      when(k % 5 === 0, lit(null))
        .otherwise(concat_ws("", lit("default"), k)).as("name"),
      when(isLatest, k % 3 =!= 1).otherwise(lit(true))
        .as("retention_enabled"),
      when(isLatest, (k * 37) % 500).otherwise(lit(0)).as("retention_days"),
      when(k % 4 === 2, array(lit("Write"), lit("Delete")))
        .otherwise(array(lit("Write"), lit("Delete"), lit("Action")))
        .as("categories"),
      when(k % 2 === 0, array(lit("eastus"), lit("westus"), lit("global")))
        .otherwise(array(lit("eastus"))).as("locations"),
      when(k % 6 === 0, lit(null)).otherwise(
        concat_ws("", lit("/subscriptions/sub-"), k,
          lit("/resourceGroups/rg"), k,
          lit("/providers/Microsoft.Storage/storageAccounts/sa"),
          (k % 10) + 1)).as("storage_account_id"))
  }

  /** azure_collect_subscriptions_locations (CIS 5.1.4/6.5): two or
    * three locations per subscription. */
  def subscriptionLocations(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(ten(k).as("tenant_id"), sub(k).as("subscription_id"),
        when(k % 2 === 1,
          array(lit("eastus"), lit("westus"), lit("centralus")))
          .otherwise(array(lit("eastus"), lit("westus"))).as("__locs"))
      .select(col("tenant_id"), col("subscription_id"),
        explode(col("__locs")).as("location_name"))
  }

  /** azure_collect_network_security_groups (CIS 6.1/6.2) landed one
    * row per securityRules element; stale snapshot wide open
    * (Allow/Inbound/TCP/3389 from anywhere). */
  def networkSecurityGroups(
      s: SparkSession, supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    withSnapshots(s, supplier)
      .select(ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
        col("recorded_at"), k.as("__k"),
        explode(array(lit(0), lit(1))).as("__i"))
      .select(col("tenant_id"), col("subscription_id"), col("recorded_at"),
        concat_ws("", lit("nsg-"), col("__k")).as("nsg_id"),
        concat_ws("", lit("nsg"), col("__k")).as("nsg_name"),
        when(isLatest,
          when((col("__k") + col("__i")) % 3 === 0, "Allow")
            .otherwise("Deny"))
          .otherwise("Allow").as("access"),
        when(isLatest, when(col("__i") === 0, "Inbound").otherwise("Outbound"))
          .otherwise("Inbound").as("direction"),
        when(isLatest,
          when((col("__k") + col("__i")) % 2 === 0, "TCP").otherwise("UDP"))
          .otherwise("TCP").as("protocol"),
        when(isLatest,
          when((col("__k") + col("__i")) % 5 === 0, "3389")
            .when((col("__k") + col("__i")) % 5 === 1, "22")
            .when((col("__k") + col("__i")) % 5 === 2, "3000-4000")
            .when((col("__k") + col("__i")) % 5 === 3, "80")
            .otherwise("20-25"))
          .otherwise("3389").as("destination_port_range"),
        when(isLatest,
          when(col("__k") % 4 === 0, "*")
            .when(col("__k") % 4 === 1, "10.0.0.0/8")
            .when(col("__k") % 4 === 2, "0.0.0.0")
            .otherwise("internet"))
          .otherwise("*").as("source_address_prefix"))
  }

  /** azure_collect_network_watchers (CIS 6.5): one eastus watcher per
    * subscription; every fourth still provisioning. */
  def networkWatchers(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      concat_ws("", lit("nw-"), k).as("nw_id"),
      lit("eastus").as("location_name"),
      when(k % 4 === 0, "Updating").otherwise("Succeeded")
        .as("provisioning_state"))
  }

  /** azure_collect_virtual_machines (CIS 7.1): one VM per customer
    * with its managed OS disk id. */
  def virtualMachines(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(
      ten(c % 25).as("tenant_id"), sub(c % 25).as("subscription_id"),
      concat_ws("", lit("/subscriptions/sub-"), c % 25,
        lit("/providers/Microsoft.Compute/virtualMachines/vm"), c)
        .as("vm_id"),
      concat_ws("", lit("disk-os-"), c).as("os_disk_id"))
  }

  /** VM dataDisks landed one row per element (CIS 7.2): customer c has
    * c%3 data disks; `__slot` (c+j) is kept so the disks view can
    * assign encryption deterministically on both engines. */
  def vmDataDisks(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer
      .select(ten(c % 25).as("tenant_id"), sub(c % 25).as("subscription_id"),
        concat_ws("", lit("/subscriptions/sub-"), c % 25,
          lit("/providers/Microsoft.Compute/virtualMachines/vm"), c)
          .as("vm_id"),
        c.as("__c"), explode(array(lit(0), lit(1))).as("__j"))
      .filter(col("__j") < col("__c") % 3)
      .select(col("tenant_id"), col("subscription_id"), col("vm_id"),
        concat_ws("-", lit("disk-d"), col("__c"), col("__j"))
          .as("data_disk_id"),
        (col("__c") + col("__j")).as("__slot"))
  }

  private val GoodEnc = "EncryptionAtRestWithCustomerKey"
  private val GoodEnc2 = "EncryptionAtRestWithPlatformAndCustomerKeys"
  private val BadEnc = "EncryptionAtRestWithPlatformKey"

  /** azure_collect_disks (CIS 7.1-7.3): OS disks (every seventh
    * missing — visibility gaps the reference works around), per-VM data
    * disks, and unattached disks from the subscription universe. */
  def disks(s: SparkSession, customer: DataFrame, nation: DataFrame)
      : DataFrame = {
    val c = col("c_custkey")
    val os = customer.filter(c % 7 =!= 0).select(
      ten(c % 25).as("tenant_id"), sub(c % 25).as("subscription_id"),
      concat_ws("", lit("disk-os-"), c).as("disk_id"),
      concat_ws("", lit("/subscriptions/sub-"), c % 25,
        lit("/providers/Microsoft.Compute/virtualMachines/vm"), c)
        .as("managed_by"),
      when(c % 4 === 1, GoodEnc).when(c % 4 === 2, GoodEnc2)
        .otherwise(BadEnc).as("encryption_type"))
    val data = vmDataDisks(customer)
      .select(col("tenant_id"), col("subscription_id"),
        col("data_disk_id").as("disk_id"), col("vm_id").as("managed_by"),
        when(col("__slot") % 3 === 0, BadEnc)
          .when(col("__slot") % 3 === 1, GoodEnc)
          .otherwise(GoodEnc2).as("encryption_type"))
    val k = col("n_nationkey")
    val free = nation.select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      concat_ws("", lit("disk-free-"), k).as("disk_id"),
      lit(null).cast("string").as("managed_by"),
      when(k % 3 === 0, BadEnc).otherwise(GoodEnc).as("encryption_type"))
    os.unionByName(data).unionByName(free)
  }

  /** azure_collect_virtual_machines_extensions (CIS 7.4). */
  def vmExtensions(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.filter(c % 2 === 0).select(
      ten(c % 25).as("tenant_id"),
      concat_ws("", lit("/subscriptions/sub-"), c % 25,
        lit("/providers/Microsoft.Compute/virtualMachines/vm"), c)
        .as("vm_id"),
      when(c % 5 === 0, "LinuxDiagnostic")
        .when(c % 5 === 1, "AzureNetworkWatcherExtension")
        .when(c % 5 === 2, "CustomScript")
        .when(c % 5 === 3, "MDE.Linux").as("name"))
  }

  /** azure_collect_vaults_keys (CIS 8.1): error rows excluded by the
    * rule; enabled keys without expiry violate. */
  def vaultsKeys(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(
      ten(c % 25).as("tenant_id"),
      concat_ws("", lit("https://kv"), c % 10,
        lit(".vault.example/keys/k"), c).as("key_id"),
      (c % 3 =!= 0).as("enabled"),
      when(c % 4 === 0, lit(null))
        .otherwise(lit("2025-01-01 00:00:00")).cast("timestamp")
        .as("expires"),
      when(c % 11 === 0, "AccessDenied").as("error"))
  }

  /** azure_collect_vaults_secrets (CIS 8.2). */
  def vaultsSecrets(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    customer.select(
      ten(c % 25).as("tenant_id"),
      concat_ws("", lit("https://kv"), c % 10,
        lit(".vault.example/secrets/s"), c).as("secret_id"),
      (c % 2 === 0).as("enabled"),
      when(c % 5 === 0, lit(null))
        .otherwise(lit("2025-01-01 00:00:00")).cast("timestamp")
        .as("expires"),
      when(c % 13 === 0, "AccessDenied").as("error"))
  }

  /** azure_collect_vaults (CIS 5.1.7). */
  def vaults(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(
      ten(k).as("tenant_id"), sub(k).as("subscription_id"),
      concat_ws("", lit("vault-"), k).as("vault_id"),
      when(k % 9 === 0, lit(null))
        .otherwise(concat_ws("", lit("kv"), k)).as("name"))
  }

  /** azure_collect_diagnostic_settings (CIS 5.1.7): the post-extract
    * scalar columns of properties:logs[0]; every third vault has no
    * diagnostic setting at all (left-join miss = logs NULL). */
  def diagnosticSettings(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.filter(k % 3 =!= 2).select(
      concat_ws("", lit("vault-"), k).as("resource_uri"),
      when(k % 4 === 0, "AllLogs").otherwise("AuditEvent")
        .as("log_category"),
      (k % 5 =!= 1).as("log_enabled"),
      (k % 2 === 0).as("log_retention_enabled"),
      when(k % 6 === 0, lit(0)).otherwise(lit(90)).as("log_retention_days"))
  }

  /** azure_collect_role_definitions (CIS 1.23) landed one row per
    * recursively-flattened property path (the reference's LATERAL
    * FLATTEN recursive=>true shape): assignableScopes elements and
    * permissions actions. */
  def roleDefinitions(s: SparkSession, nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(ten(k).as("tenant_id"), sub(k).as("subscription_id"),
        concat_ws("", lit("rd-"), k).as("id"),
        when(k % 4 === 0, "BuiltInRole").otherwise("CustomRole")
          .as("prop_type"),
        k.as("__k"), explode(array(lit(0), lit(1))).as("__i"))
      .select(col("tenant_id"), col("subscription_id"), col("id"),
        col("prop_type"),
        when(col("__i") === 0, "assignableScopes[0]")
          .otherwise("permissions[0].actions[0]").as("path"),
        when(col("__i") === 0,
          when(col("__k") % 3 === 0, "/")
            .when(col("__k") % 3 === 1,
              concat_ws("", lit("/subscriptions/aa-"), col("__k")))
            .otherwise(concat_ws("", lit("/resourceGroups/rg"), col("__k"))))
          .otherwise(
            when(col("__k") % 2 === 0, "*")
              .otherwise("Microsoft.Compute/read")).as("value"))
  }

  // --- unconsumed SUPPLEMENTARY_TABLES (azure_collect.py:70) ---------
  // The eight landing shapes no cis_azure_pack rule reads — inventory
  // snapshots only. Landed latest-snapshot (D2) like the other purely
  // dimensional views; VARIANT subtrees land as JSON strings (the
  // engine-wide VARIANT stand-in). Closing these makes azure_collect
  // connector-module parity exact rather than "all that packs consume".

  /** azure_collect_managed_clusters (azure_collect.py managed_clusters;
    * AKS clusters listed per subscription). */
  def managedClusters(supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("/subscriptions/sub-"), k % 25,
        lit("/providers/Microsoft.ContainerService/managedClusters/aks"), k)
        .as("id"),
      lit("""{"type":"SystemAssigned"}""").as("identity"),
      when(k % 2 === 0, "eastus").otherwise("westus").as("location"),
      concat_ws("", lit("aks"), k).as("name"),
      format_string("""{"kubernetesVersion":"1.%d.0","enableRBAC":%s}""",
        (k % 5 + 24).cast("int"), (k % 3 =!= 0).cast("string"))
        .as("properties"),
      lit("""{"env":"prod"}""").as("tags"),
      lit("Microsoft.ContainerService/ManagedClusters").as("type"))
  }

  /** azure_collect_resource_groups (subscription resource groups; two
    * per subscription). */
  def resourceGroups(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation
      .select(col("n_nationkey"), explode(array(lit(0), lit(1))).as("__i"))
      .select(
        lit(D2).cast("timestamp").as("recorded_at"),
        ten(k).as("tenant_id"), sub(k).as("subscription_id"),
        lit(null).cast("string").as("error"),
        concat_ws("", lit("/subscriptions/sub-"), k,
          lit("/resourceGroups/rg"), k * 2 + col("__i")).as("id"),
        when(col("__i") === 0, "eastus").otherwise("westus").as("location"),
        lit(null).cast("string").as("managed_by"),
        concat_ws("", lit("rg"), k * 2 + col("__i")).as("name"),
        lit("""{"provisioningState":"Succeeded"}""").as("properties"),
        lit(null).cast("string").as("tags"),
        lit("Microsoft.Resources/resourceGroups").as("type"))
  }

  private def appServiceShape(supplier: DataFrame, kindV: String,
      prefix: String, typeV: String, props: Column): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("/subscriptions/sub-"), k % 25,
        lit(s"/providers/Microsoft.Web/$prefix/"), lit(kindV), k).as("id"),
      lit(kindV).as("kind"),
      when(k % 2 === 0, "eastus").otherwise("westus").as("location"),
      concat_ws("", lit(kindV), k).as("name"),
      props.as("properties"),
      lit(null).cast("string").as("tags"),
      lit(typeV).as("type"))
  }

  /** azure_collect_hosting_environments (App Service Environments). */
  def hostingEnvironments(supplier: DataFrame): DataFrame =
    appServiceShape(supplier, "ase", "hostingEnvironments",
      "Microsoft.Web/hostingEnvironments",
      format_string("""{"status":"Ready","internalLoadBalancingMode":"%s"}""",
        when(col("s_suppkey") % 3 === 0, "None").otherwise("Web")))

  /** azure_collect_webapps (App Service web apps; the https-only flag
    * is the property a future CIS 9.x rule would read). */
  def webapps(supplier: DataFrame): DataFrame =
    appServiceShape(supplier, "app", "sites", "Microsoft.Web/sites",
      format_string("""{"httpsOnly":%s,"state":"Running"}""",
        (col("s_suppkey") % 4 =!= 0).cast("string")))

  /** azure_collect_workflows (Logic Apps listed per resource group —
    * the one supplementary shape keyed by (subscription, rg)). */
  def workflows(supplier: DataFrame): DataFrame = {
    val k = col("s_suppkey")
    supplier.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(k % 25).as("tenant_id"), sub(k % 25).as("subscription_id"),
      concat_ws("", lit("rg"), (k % 25) * 2).as("resource_group_name"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("/subscriptions/sub-"), k % 25,
        lit("/resourceGroups/rg"), (k % 25) * 2,
        lit("/providers/Microsoft.Logic/workflows/wf"), k).as("id"),
      concat_ws("", lit("wf"), k).as("name"),
      lit("Microsoft.Logic/workflows").as("type"),
      format_string("""{"state":"%s"}""",
        when(k % 5 === 0, "Disabled").otherwise("Enabled"))
        .as("properties"))
  }

  /** azure_collect_groups (Graph groups; the full landing column list —
    * Graph responses are sparse, so most optional columns land typed
    * null, exactly what the reference's VARIANT-path extraction
    * produces for absent keys). */
  def groups(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    val gid = c % 8
    def nstr(n: String) = lit(null).cast("string").as(n)
    def nbool(n: String) = lit(null).cast("boolean").as(n)
    def nts(n: String) = lit(null).cast("timestamp").as(n)
    customer.filter(c <= 8).select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(gid).as("tenant_id"),
      lit(null).cast("string").as("error"),
      lit(false).as("allow_external_senders"),
      nstr("assigned_licenses"),
      nbool("auto_subscribe_new_members"),
      nstr("classification"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("created"),
      nstr("creation_options"), nts("deleted"),
      concat_ws("", lit("group "), gid).as("description"),
      concat_ws("", lit("grp-"), gid).as("display_name"),
      when(gid % 2 === 0, "Unified").otherwise(lit(null)).as("group_types"),
      lit(false).as("has_members_with_license_errors"),
      concat_ws("", lit("g-"), gid).as("id"),
      (gid === 0).as("is_assignable_to_role"),
      nbool("is_subscribed_by_mail"),
      nstr("license_processing_state"),
      concat_ws("", lit("grp-"), gid, lit("@corp.example")).as("mail"),
      (gid % 2 === 0).as("mail_enabled"),
      concat_ws("", lit("grp-"), gid).as("mail_nickname"),
      nts("on_premises_last_sync"), nstr("on_premises_domain_name"),
      nstr("on_premises_net_bios_name"),
      nstr("on_premises_sam_account_name"),
      nstr("resource_behavior_options"),
      nstr("resource_provisioning_options"),
      nstr("on_premises_provisioning_errors"),
      nstr("on_premises_security_identifier"),
      lit(false).as("on_premises_sync_enabled"),
      nstr("preferred_data_location"), nstr("proxy_addresses"),
      nts("renewed"),
      lit(true).as("security_enabled"),
      concat_ws("", lit("S-1-12-"), gid).as("security_identifier"),
      lit(null).cast("long").as("unseen_count"),
      when(gid % 3 === 0, "Private").otherwise("Public").as("visibility"),
      nts("expiration"), nstr("membership_rule"),
      nstr("membership_rule_processing_state"),
      nstr("preferred_language"), nstr("theme"),
      lit(null).cast("string").as("raw"))
  }

  /** azure_collect_groups_members (Graph group members — one landing
    * row per (group, member); customer c is a member of group c%8, so
    * every group_id joins back to [[groups]]). */
  def groupsMembers(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    def nstr(n: String) = lit(null).cast("string").as(n)
    customer.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(c % 8).as("tenant_id"),
      concat_ws("", lit("g-"), c % 8).as("group_id"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("u-"), c).as("id"),
      lit("#microsoft.graph.user").as("odata_type"),
      nstr("business_phones"),
      concat_ws("", lit("User "), c).as("display_name"),
      concat_ws("", lit("User"), c).as("given_name"),
      nstr("job_title"),
      concat_ws("", lit("user"), c, lit("@corp.example")).as("mail"),
      nstr("mobile_phone"), nstr("office_location"),
      nstr("preferred_language"), nstr("surname"),
      concat_ws("", lit("user"), c, lit("@corp.example"))
        .as("user_principal_name"),
      lit(D2).cast("timestamp").as("header_date"),
      lit(null).cast("timestamp").as("deleted"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("created"),
      nstr("classification"), nstr("creation_options"),
      nstr("description"),
      lit(null).cast("string").as("raw"))
  }

  /** azure_collect_managed_devices (Intune managed devices; the
    * compliance/encryption columns get deterministic values, the long
    * sparse tail lands typed null like the Graph shapes). */
  def managedDevices(customer: DataFrame): DataFrame = {
    val c = col("c_custkey")
    def nstr(n: String) = lit(null).cast("string").as(n)
    def nts(n: String) = lit(null).cast("timestamp").as(n)
    customer.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      ten(c % 3).as("tenant_id"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("md-"), c).as("id"),
      concat_ws("", lit("u-"), c).as("user_id"),
      concat_ws("", lit("device"), c).as("device_name"),
      when(c % 5 === 0, "personal").otherwise("company")
        .as("managed_device_owner_type"),
      nstr("device_action_results"),
      lit("2023-06-01 00:00:00").cast("timestamp").as("enrolled"),
      lit(D2).cast("timestamp").as("last_sync"),
      when(c % 3 === 0, "iOS").when(c % 3 === 1, "Windows")
        .otherwise("Android").as("operating_system"),
      when(c % 4 === 0, "noncompliant").otherwise("compliant")
        .as("compliance_state"),
      when(c % 11 === 0, "True").otherwise("False").as("jail_broken"),
      lit("mdm").as("management_agent"),
      concat_ws(".", c % 3 + 14, c % 7).as("os_version"),
      lit(false).as("eas_activated"), nstr("eas_device_id"),
      nts("eas_activation"),
      lit(true).as("azure_a_d_registered"),
      lit("userEnrollment").as("device_enrollment_type"),
      nstr("activation_lock_bypass_code"),
      concat_ws("", lit("user"), c, lit("@corp.example"))
        .as("email_address"),
      concat_ws("", lit("aad-"), c).as("azure_a_d_device_id"),
      lit("registered").as("device_registration_state"),
      nstr("device_category_display_name"),
      (c % 2 === 0).as("is_supervised"),
      nts("exchange_last_successful_sync"),
      lit("none").as("exchange_access_state"),
      lit("none").as("exchange_access_state_reason"),
      nstr("remote_assistance_session_url"),
      nstr("remote_assistance_session_error_details"),
      (c % 6 =!= 0).as("is_encrypted"),
      concat_ws("", lit("user"), c, lit("@corp.example"))
        .as("user_principal_name"),
      nstr("model"), nstr("manufacturer"), nstr("imei"),
      nts("compliance_grace_period_expiration"),
      concat_ws("", lit("SN"), c).as("serial_number"),
      nstr("phone_number"), nstr("android_security_patch_level"),
      concat_ws("", lit("User "), c).as("user_display_name"),
      nstr("configuration_manager_client_enabled_features"),
      nstr("wi_fi_mac_address"),
      nstr("device_health_attestation_state"),
      nstr("subscriber_carrier"), nstr("meid"),
      (c * 1024L * 1024L).as("total_storage_space_in_bytes"),
      (c * 512L * 1024L).as("free_storage_space_in_bytes"),
      concat_ws("", lit("device"), c).as("managed_device_name"),
      lit("unknown").as("partner_reported_threat_state"),
      lit(null).cast("string").as("raw"))
  }

  /** azure_collect_activity_log_alerts (Monitor activity-log alert
    * rules listed per subscription). */
  def activityLogAlerts(nation: DataFrame): DataFrame = {
    val k = col("n_nationkey")
    nation.select(
      lit(D2).cast("timestamp").as("recorded_at"),
      sub(k).as("subscription_id"), ten(k).as("tenant_id"),
      lit(null).cast("string").as("error"),
      concat_ws("", lit("/subscriptions/sub-"), k,
        lit("/providers/microsoft.insights/activityLogAlerts/ala"), k)
        .as("id"),
      lit("Global").as("location"),
      concat_ws("", lit("ala"), k).as("name"),
      format_string(
        """{"enabled":%s,"condition":{"field":"operationName"}}""",
        (k % 4 =!= 0).cast("string")).as("properties"),
      lit(null).cast("string").as("tags"),
      lit("Microsoft.Insights/ActivityLogAlerts").as("type"),
      lit(null).cast("string").as("kind"),
      lit(null).cast("string").as("identity"))
  }

  /** The az_policy CTE's 13 monitoring-effect CASE columns, generated
    * from the same (key + rule index) formula the Spark view uses. */
  private val PolicyColsSql: String =
    MonitoringEffects.zipWithIndex.map { case (p, i) =>
      s"""    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
         |      CASE WHEN (n_nationkey + $i) % 4 = 0 THEN 'Disabled'
         |           WHEN (n_nationkey + $i) % 4 = 1 THEN NULL
         |           ELSE 'Audit' END
         |    ELSE 'Disabled' END AS $p""".stripMargin
    }.mkString(",\n")

  private val AzureCtesHead: String =
    """WITH az_snaps(recorded_at) AS (
      |  VALUES (TIMESTAMP '2024-01-20 00:00:00'),
      |         (TIMESTAMP '2024-01-30 00:00:00')
      |), az_pricings AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'default' AS name, recorded_at,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 3 = 0 THEN 'Free' ELSE 'Standard' END
      |    ELSE 'Free' END AS pricing_tier
      |  FROM nation, az_snaps
      |), az_autoprov AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'default' AS name, recorded_at,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 4 = 0 THEN 'Off' ELSE 'On' END
      |    ELSE 'Off' END AS auto_provision
      |  FROM nation, az_snaps
      |), az_contacts AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'default1' AS name, recorded_at,
      |    CASE WHEN n_nationkey % 7 = 0 THEN NULL
      |         ELSE 'Microsoft.Security/securityContacts' END AS type,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 3 = 0 THEN '' ELSE 'sec@corp.example' END
      |    ELSE '' END AS email,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 4 = 0 THEN '' ELSE '+1-555-0100' END
      |    ELSE '' END AS phone,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 5 = 0 THEN 'Off' ELSE 'On' END
      |    ELSE 'Off' END AS alert_notifications,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN n_nationkey % 6 = 0 THEN 'Off' ELSE 'On' END
      |    ELSE 'Off' END AS alerts_to_admins
      |  FROM nation, az_snaps
      |), az_storage AS (
      |  SELECT 't' || ((s_suppkey % 25) % 3) AS tenant_id,
      |    'sub-' || (s_suppkey % 25) AS subscription_id,
      |    'sa' || s_suppkey AS account_name,
      |    '/subscriptions/sub-' || (s_suppkey % 25) || '/resourceGroups/rg'
      |      || s_suppkey || '/providers/Microsoft.Storage/storageAccounts/sa'
      |      || s_suppkey AS account_id,
      |    'StorageV2' AS kind, recorded_at,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN s_suppkey % 3 <> 0 ELSE false END
      |      AS supports_https_traffic_only,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN s_suppkey % 4 = 0 THEN 'Allow' ELSE 'Deny' END
      |    ELSE 'Allow' END AS network_default_action,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN s_suppkey % 5 = 0 THEN 'None'
      |           WHEN s_suppkey % 5 = 1 THEN 'AzureServices, Logging'
      |           ELSE 'AzureServices' END
      |    ELSE 'None' END AS network_bypass,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN s_suppkey % 3 = 1 THEN 'Microsoft.Storage'
      |           ELSE 'Microsoft.Keyvault' END
      |    ELSE 'Microsoft.Storage' END AS key_source,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |           AND s_suppkey % 3 = 0
      |      THEN 'kv' || s_suppkey END AS key_vault_properties
      |  FROM supplier, az_snaps
      |), az_containers AS (
      |  SELECT 't' || ((s_suppkey % 25) % 3) AS tenant_id,
      |    'sub-' || (s_suppkey % 25) AS subscription_id,
      |    'sa' || s_suppkey AS account_name, recorded_at,
      |    CASE WHEN i.i = 0 THEN
      |      CASE WHEN s_suppkey % 2 = 0 THEN 'insight-operational-logs'
      |           ELSE 'data0' END
      |    ELSE 'logs' || s_suppkey END AS container_name,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN (s_suppkey + i.i) % 3 = 0 THEN 'Container' END
      |    ELSE 'Container' END AS public_access
      |  FROM supplier, az_snaps, (VALUES (0), (1)) i(i)
      |), az_queues AS (
      |  SELECT 't' || ((s_suppkey % 25) % 3) AS tenant_id,
      |    'sub-' || (s_suppkey % 25) AS subscription_id,
      |    'sa' || s_suppkey AS account_name, recorded_at,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN s_suppkey % 3 <> 0 ELSE false END AS logging_read,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN s_suppkey % 4 <> 0 ELSE false END AS logging_write,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN s_suppkey % 5 <> 0 ELSE false END AS logging_delete
      |  FROM supplier, az_snaps
      |), az_sql_audit AS (
      |  SELECT 't' || ((s_suppkey % 25) % 3) AS tenant_id, recorded_at,
      |    '/subscriptions/sub-' || (s_suppkey % 25) || '/resourceGroups/rg'
      |      || s_suppkey || '/providers/Microsoft.Sql/servers/sqlsrv'
      |      || s_suppkey AS server_full_id,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN s_suppkey % 3 = 1 THEN 'Disabled' ELSE 'Enabled' END
      |    ELSE 'Disabled' END AS auditing_state
      |  FROM supplier, az_snaps
      |), az_logprofiles AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'lp-' || n_nationkey AS log_profile_id, recorded_at,
      |    CASE WHEN n_nationkey % 5 = 0 THEN NULL
      |         ELSE 'default' || n_nationkey END AS name,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN n_nationkey % 3 <> 1 ELSE true END AS retention_enabled,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00'
      |      THEN (n_nationkey * 37) % 500 ELSE 0 END AS retention_days,
      |    CASE WHEN n_nationkey % 4 = 2 THEN ['Write', 'Delete']
      |         ELSE ['Write', 'Delete', 'Action'] END AS categories,
      |    CASE WHEN n_nationkey % 2 = 0 THEN ['eastus', 'westus', 'global']
      |         ELSE ['eastus'] END AS locations,
      |    CASE WHEN n_nationkey % 6 = 0 THEN NULL
      |         ELSE '/subscriptions/sub-' || n_nationkey
      |           || '/resourceGroups/rg' || n_nationkey
      |           || '/providers/Microsoft.Storage/storageAccounts/sa'
      |           || ((n_nationkey % 10) + 1) END AS storage_account_id
      |  FROM nation, az_snaps
      |), az_sublocs AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    UNNEST(CASE WHEN n_nationkey % 2 = 1
      |      THEN ['eastus', 'westus', 'centralus']
      |      ELSE ['eastus', 'westus'] END) AS location_name
      |  FROM nation
      |), az_nsg AS (
      |  SELECT 't' || ((s_suppkey % 25) % 3) AS tenant_id,
      |    'sub-' || (s_suppkey % 25) AS subscription_id, recorded_at,
      |    'nsg-' || s_suppkey AS nsg_id, 'nsg' || s_suppkey AS nsg_name,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN (s_suppkey + i.i) % 3 = 0 THEN 'Allow' ELSE 'Deny' END
      |    ELSE 'Allow' END AS access,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN i.i = 0 THEN 'Inbound' ELSE 'Outbound' END
      |    ELSE 'Inbound' END AS direction,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE WHEN (s_suppkey + i.i) % 2 = 0 THEN 'TCP' ELSE 'UDP' END
      |    ELSE 'TCP' END AS protocol,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE (s_suppkey + i.i) % 5
      |        WHEN 0 THEN '3389' WHEN 1 THEN '22' WHEN 2 THEN '3000-4000'
      |        WHEN 3 THEN '80' ELSE '20-25' END
      |    ELSE '3389' END AS destination_port_range,
      |    CASE WHEN recorded_at = TIMESTAMP '2024-01-30 00:00:00' THEN
      |      CASE s_suppkey % 4 WHEN 0 THEN '*' WHEN 1 THEN '10.0.0.0/8'
      |        WHEN 2 THEN '0.0.0.0' ELSE 'internet' END
      |    ELSE '*' END AS source_address_prefix
      |  FROM supplier, az_snaps, (VALUES (0), (1)) i(i)
      |), az_watchers AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'nw-' || n_nationkey AS nw_id, 'eastus' AS location_name,
      |    CASE WHEN n_nationkey % 4 = 0 THEN 'Updating'
      |         ELSE 'Succeeded' END AS provisioning_state
      |  FROM nation
      |), az_vms AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    'sub-' || (c_custkey % 25) AS subscription_id,
      |    '/subscriptions/sub-' || (c_custkey % 25)
      |      || '/providers/Microsoft.Compute/virtualMachines/vm'
      |      || c_custkey AS vm_id,
      |    'disk-os-' || c_custkey AS os_disk_id
      |  FROM customer
      |), az_vm_disks AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    'sub-' || (c_custkey % 25) AS subscription_id,
      |    '/subscriptions/sub-' || (c_custkey % 25)
      |      || '/providers/Microsoft.Compute/virtualMachines/vm'
      |      || c_custkey AS vm_id,
      |    'disk-d-' || c_custkey || '-' || j.j AS data_disk_id,
      |    c_custkey + j.j AS slot
      |  FROM customer, (VALUES (0), (1)) j(j)
      |  WHERE j.j < c_custkey % 3
      |), az_disks AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    'sub-' || (c_custkey % 25) AS subscription_id,
      |    'disk-os-' || c_custkey AS disk_id,
      |    '/subscriptions/sub-' || (c_custkey % 25)
      |      || '/providers/Microsoft.Compute/virtualMachines/vm'
      |      || c_custkey AS managed_by,
      |    CASE WHEN c_custkey % 4 = 1 THEN 'EncryptionAtRestWithCustomerKey'
      |         WHEN c_custkey % 4 = 2
      |           THEN 'EncryptionAtRestWithPlatformAndCustomerKeys'
      |         ELSE 'EncryptionAtRestWithPlatformKey' END AS encryption_type
      |  FROM customer WHERE c_custkey % 7 <> 0
      |  UNION ALL
      |  SELECT tenant_id, subscription_id, data_disk_id, vm_id,
      |    CASE slot % 3
      |      WHEN 0 THEN 'EncryptionAtRestWithPlatformKey'
      |      WHEN 1 THEN 'EncryptionAtRestWithCustomerKey'
      |      ELSE 'EncryptionAtRestWithPlatformAndCustomerKeys' END
      |  FROM az_vm_disks
      |  UNION ALL
      |  SELECT 't' || (n_nationkey % 3), 'sub-' || n_nationkey,
      |    'disk-free-' || n_nationkey, NULL,
      |    CASE WHEN n_nationkey % 3 = 0
      |      THEN 'EncryptionAtRestWithPlatformKey'
      |      ELSE 'EncryptionAtRestWithCustomerKey' END
      |  FROM nation
      |), az_vm_ext AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    '/subscriptions/sub-' || (c_custkey % 25)
      |      || '/providers/Microsoft.Compute/virtualMachines/vm'
      |      || c_custkey AS vm_id,
      |    CASE c_custkey % 5 WHEN 0 THEN 'LinuxDiagnostic'
      |      WHEN 1 THEN 'AzureNetworkWatcherExtension'
      |      WHEN 2 THEN 'CustomScript'
      |      WHEN 3 THEN 'MDE.Linux' END AS name
      |  FROM customer WHERE c_custkey % 2 = 0
      |), az_keys AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    'https://kv' || (c_custkey % 10) || '.vault.example/keys/k'
      |      || c_custkey AS key_id,
      |    c_custkey % 3 <> 0 AS enabled,
      |    CASE WHEN c_custkey % 4 = 0 THEN NULL
      |         ELSE TIMESTAMP '2025-01-01 00:00:00' END AS expires,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'AccessDenied' END AS error
      |  FROM customer
      |), az_secrets AS (
      |  SELECT 't' || ((c_custkey % 25) % 3) AS tenant_id,
      |    'https://kv' || (c_custkey % 10) || '.vault.example/secrets/s'
      |      || c_custkey AS secret_id,
      |    c_custkey % 2 = 0 AS enabled,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL
      |         ELSE TIMESTAMP '2025-01-01 00:00:00' END AS expires,
      |    CASE WHEN c_custkey % 13 = 0 THEN 'AccessDenied' END AS error
      |  FROM customer
      |), az_vaults AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'vault-' || n_nationkey AS vault_id,
      |    CASE WHEN n_nationkey % 9 = 0 THEN NULL
      |         ELSE 'kv' || n_nationkey END AS name
      |  FROM nation
      |), az_diag AS (
      |  SELECT 'vault-' || n_nationkey AS resource_uri,
      |    CASE WHEN n_nationkey % 4 = 0 THEN 'AllLogs'
      |         ELSE 'AuditEvent' END AS log_category,
      |    n_nationkey % 5 <> 1 AS log_enabled,
      |    n_nationkey % 2 = 0 AS log_retention_enabled,
      |    CASE WHEN n_nationkey % 6 = 0 THEN 0 ELSE 90 END
      |      AS log_retention_days
      |  FROM nation WHERE n_nationkey % 3 <> 2
      |), az_roledefs AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'rd-' || n_nationkey AS id,
      |    CASE WHEN n_nationkey % 4 = 0 THEN 'BuiltInRole'
      |         ELSE 'CustomRole' END AS prop_type,
      |    CASE WHEN i.i = 0 THEN 'assignableScopes[0]'
      |         ELSE 'permissions[0].actions[0]' END AS path,
      |    CASE WHEN i.i = 0 THEN
      |      CASE WHEN n_nationkey % 3 = 0 THEN '/'
      |           WHEN n_nationkey % 3 = 1
      |             THEN '/subscriptions/aa-' || n_nationkey
      |           ELSE '/resourceGroups/rg' || n_nationkey END
      |    ELSE
      |      CASE WHEN n_nationkey % 2 = 0 THEN '*'
      |           ELSE 'Microsoft.Compute/read' END
      |    END AS value
      |  FROM nation, (VALUES (0), (1)) i(i)
      |)""".stripMargin

  /** The full DuckDB WITH preamble — twins of every view above plus the
    * `az_policy` CTE the ASC-default oracles read; value logic verbatim
    * against the Spark views. */
  val AzureCtes: String = AzureCtesHead +
    s""", az_policy AS (
      |  SELECT 't' || (n_nationkey % 3) AS tenant_id,
      |    'sub-' || n_nationkey AS subscription_id,
      |    'SecurityCenterBuiltIn' AS name, recorded_at,
      |$PolicyColsSql
      |  FROM nation, az_snaps
      |)""".stripMargin

  /** Per-(session, sf-dir) persisted snapshot views — the code-level
    * analogue of the landed `azure_collect_*` tables the reference's
    * rules read (connectors/azure_collect.py lands each API page once
    * per collection cycle; every pack rule then scans the landed
    * table). Only the RAW views are persisted: recency filters and
    * QUALIFY latest-snapshot dedup stay inside each rule, so the
    * stale-snapshot (D1) traps keep biting a rule that forgets them.
    * At cluster scale the analogue is the collect cycle writing each
    * snapshot to parquet once and 41 rules scanning the columnar
    * landed form instead of re-deriving it. */
  object Shared {
    import graft.Tables.t
    private def v(s: SparkSession, dir: String, name: String)(
        b: => DataFrame): DataFrame =
      SharedFrames.get(s, dir, "az_" + name)(b)
    private def nat(s: SparkSession, dir: String) = t(s, dir, "nation")
    private def sup(s: SparkSession, dir: String) = t(s, dir, "supplier")
    private def cus(s: SparkSession, dir: String) = t(s, dir, "customer")

    def roleDefinitions(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "role_definitions")(
        AzureCollectViews.roleDefinitions(s, nat(s, dir)))
    def pricings(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "pricings")(AzureCollectViews.pricings(s, nat(s, dir)))
    def autoProvisioning(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "auto_provisioning")(
        AzureCollectViews.autoProvisioning(s, nat(s, dir)))
    def policyAssignments(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "policy_assignments")(
        AzureCollectViews.policyAssignments(s, nat(s, dir)))
    def securityContacts(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "security_contacts")(
        AzureCollectViews.securityContacts(s, nat(s, dir)))
    def queueServices(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "queue_services")(
        AzureCollectViews.queueServices(s, sup(s, dir)))
    def storageAccounts(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "storage_accounts")(
        AzureCollectViews.storageAccounts(s, sup(s, dir)))
    def storageContainers(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "storage_containers")(
        AzureCollectViews.storageContainers(s, sup(s, dir)))
    def sqlServersAuditing(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "sql_servers_auditing")(
        AzureCollectViews.sqlServersAuditing(s, sup(s, dir)))
    def logProfiles(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "log_profiles")(
        AzureCollectViews.logProfiles(s, nat(s, dir)))
    def subscriptionLocations(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "subscription_locations")(
        AzureCollectViews.subscriptionLocations(nat(s, dir)))
    def networkSecurityGroups(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "network_security_groups")(
        AzureCollectViews.networkSecurityGroups(s, sup(s, dir)))
    def vaults(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "vaults")(AzureCollectViews.vaults(nat(s, dir)))
    def diagnosticSettings(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "diagnostic_settings")(
        AzureCollectViews.diagnosticSettings(nat(s, dir)))
    def networkWatchers(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "network_watchers")(
        AzureCollectViews.networkWatchers(nat(s, dir)))
    def virtualMachines(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "virtual_machines")(
        AzureCollectViews.virtualMachines(cus(s, dir)))
    def vmDataDisks(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "vm_data_disks")(
        AzureCollectViews.vmDataDisks(cus(s, dir)))
    def vmExtensions(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "vm_extensions")(
        AzureCollectViews.vmExtensions(cus(s, dir)))
    def vaultsKeys(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "vaults_keys")(AzureCollectViews.vaultsKeys(cus(s, dir)))
    def vaultsSecrets(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "vaults_secrets")(
        AzureCollectViews.vaultsSecrets(cus(s, dir)))
    def disks(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "disks")(
        AzureCollectViews.disks(s, cus(s, dir), nat(s, dir)))
    def managedClusters(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "managed_clusters")(
        AzureCollectViews.managedClusters(sup(s, dir)))
    def resourceGroups(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "resource_groups")(
        AzureCollectViews.resourceGroups(nat(s, dir)))
    def hostingEnvironments(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "hosting_environments")(
        AzureCollectViews.hostingEnvironments(sup(s, dir)))
    def webapps(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "webapps")(AzureCollectViews.webapps(sup(s, dir)))
    def workflows(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "workflows")(AzureCollectViews.workflows(sup(s, dir)))
    def groups(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "groups")(AzureCollectViews.groups(cus(s, dir)))
    def groupsMembers(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "groups_members")(
        AzureCollectViews.groupsMembers(cus(s, dir)))
    def managedDevices(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "managed_devices")(
        AzureCollectViews.managedDevices(cus(s, dir)))
    def activityLogAlerts(s: SparkSession, dir: String): DataFrame =
      v(s, dir, "activity_log_alerts")(
        AzureCollectViews.activityLogAlerts(nat(s, dir)))
  }
}
