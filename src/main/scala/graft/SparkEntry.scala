package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {
  import Tables.t

  /** Flagship: full alert pipeline (rule → merge → suppress → correlate)
    * on sf0.001 events; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val flagship = queries.getOrElse("q_alert_correlate", queries("q_agg_pushdown"))
    flagship(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreSql.queries ++ Engine.queries ++ Baselines.queries ++
      Dedup.queries ++ Ann.queries ++ TextOps.queries ++ CorpusOps.queries ++
      CorpusPipeline.queries ++
      Multimodal.queries ++ graft.packs.AwsPack.queries ++
      graft.packs.SnowflakePack.queries ++ graft.packs.OktaPack.queries ++
      graft.packs.SnowflakeMonitoringPack.queries ++
      graft.packs.OsqueryPack.queries ++ graft.packs.UmbrellaPack.queries ++
      graft.packs.AzureCisPack.queries ++ graft.packs.CisAwsPack.queries ++
      graft.packs.CisAzurePack.queries ++ graft.packs.SarsPack.queries

  /** DuckDB-equivalent ANSI SQL per query key (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    CoreSql.oracle ++ Engine.oracle ++ Baselines.oracle ++
      Dedup.oracle ++ Ann.oracle ++ TextOps.oracle ++ CorpusOps.oracle ++
      CorpusPipeline.oracle ++
      Multimodal.oracle ++ graft.packs.AwsPack.oracle ++
      graft.packs.SnowflakePack.oracle ++ graft.packs.OktaPack.oracle ++
      graft.packs.SnowflakeMonitoringPack.oracle ++
      graft.packs.OsqueryPack.oracle ++ graft.packs.UmbrellaPack.oracle ++
      graft.packs.AzureCisPack.oracle ++ graft.packs.CisAwsPack.oracle ++
      graft.packs.CisAzurePack.oracle ++ graft.packs.SarsPack.oracle
}
