package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed fact-table layout — the §5 landing shape for a table that
  * exists to be joined on its key (lineitem⋈orders, alert-store⋈batch,
  * any fact⋈fact equi-join in the reference's query packs, e.g. the
  * per-orderkey revenue join of q_join_broadcast).
  *
  * A shuffle join hashes BOTH sides across the cluster every time the
  * join runs. Landing the table pre-hashed — `bucketBy(n, key)` with
  * in-bucket `sortBy` — moves that work to write time, once: Catalyst
  * sees the bucketed distribution on both scans and plans the sort-merge
  * join with NO Exchange on either side (and, when each bucket lands
  * as one file and
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` is on, no Sort
  * either — Spark 3+ stopped reporting write-time in-bucket order by
  * default because multi-file buckets interleave at read; with the
  * one-file-per-bucket landing below the order IS real and the flag
  * restores the sort-free merge, both shapes spec-pinned).
  * At 100 TB the exchange's network + disk materialization dominates
  * the join; with this layout it never happens, and each of the n
  * buckets joins co-located on its executor. Bucket count is a layout
  * constant chosen once per table family (both sides MUST agree for
  * the exchange to be elidable; pick ~table-size / 128 MB at the
  * target scale, a power of two so a later split/merge re-bucket can
  * reuse half the hash space).
  *
  * Point lookups win too: a `key = literal` filter scans 1/n of the
  * files (bucket pruning — `SelectedBucketsCount` in the scan), the
  * stored-alert-store read path of the reference's MERGE loop. One
  * Spark caveat, spec-pinned: a bare filter feeds no
  * distribution-requiring operator, so the auto-bucketed-scan
  * heuristic (`spark.sql.sources.bucketing.autoBucketedScan.enabled`,
  * default true) drops the bucketed scan — and with it the 1-of-n
  * prune; sessions serving point reads over stored bucketed tables
  * should run with it off (joins/aggregations keep their bucketed
  * scans either way, because they DO require the distribution).
  *
  * Measured (core-100× adjudication, BASELINE.md): on the 60M-row
  * lineitem⋈orders join both `Exchange hashpartitioning(l_orderkey…)`
  * nodes vanish from the executed plan; locally that saves ~0.3 s of a
  * 2.5 s join because one machine still does all the compute — on a
  * cluster the exchange IS the dominant cost and it is gone.
  *
  * Reference: SnowAlert stores alerts/violations/baselines as
  * warehouse tables keyed by the columns its MERGE/correlate queries
  * join on (alert_queries_runner.py MERGE_ALERTS ON alert_id;
  * correlation's actor join) — the warehouse clusters on those keys
  * server-side; this is the Spark-native equivalent, declared at
  * landing time.
  */
object Layout {

  /** Land `df` as bucketed parquet table `name`: hash-bucketed and
    * in-bucket sorted by `key` into `buckets` buckets, optionally
    * hive-partitioned by `partitionCols` first (the date axis of a log
    * table — partition pruning composes with bucket pruning). `path`
    * makes it an external table at that location; otherwise it lands
    * in the session warehouse. Overwrites.
    *
    * The writer emits one file per (task, bucket); to land exactly one
    * file per bucket — the shape where the scan also reports in-bucket
    * ORDER and the downstream sort-merge join plans without sorts —
    * pre-shuffle with `df.repartition(buckets, col(key))` so each
    * bucket's rows arrive in one task. That repartition is the same
    * hash the bucketing uses: one shuffle at write time buys every
    * future join. */
  def landBucketed(
      df: DataFrame,
      name: String,
      key: String,
      buckets: Int,
      partitionCols: Seq[String] = Nil,
      path: Option[String] = None): Unit =
    landBucketedKeys(df, name, Seq(key), buckets, partitionCols, path)

  /** [[landBucketed]] for a COMPOSITE key — e.g. the alert store
    * clustered on its MERGE key (object, description), the reference's
    * warehouse-clustered alerts table. Bucket hash and in-bucket sort
    * both use the full key sequence; pre-shuffle with
    * `df.repartition(buckets, keys.map(col): _*)` for the
    * one-file-per-bucket landing. */
  def landBucketedKeys(
      df: DataFrame,
      name: String,
      keys: Seq[String],
      buckets: Int,
      partitionCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(buckets > 0, "buckets must be positive")
    require(keys.nonEmpty, "at least one bucket key required")
    var w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(name)
    // Verify the one-file-per-bucket invariant LOUDLY at landing time:
    // sessions that read this table under
    // spark.sql.legacy.bucketedTableScan.outputOrdering=true depend on
    // it for CORRECTNESS (multi-file buckets interleave at read, so a
    // reported sort order would be false and a downstream sort-merge
    // join silently wrong). A landing that forgot the
    // repartition(buckets, key) pre-shuffle must fail here, not there.
    val loc = path.getOrElse(
      df.sparkSession.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location.getPath)
    // Walk with the Hadoop FileSystem API, not java.io.File: the guard
    // must hold on ANY filesystem the table lands on (HDFS/S3A/local) —
    // a local-only walk would silently find nothing remote and pass,
    // leaving the outputOrdering flag's correctness contract unchecked
    // exactly where it matters.
    val bucketId = java.util.regex.Pattern.compile("_(\\d{5})\\.")
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(loc)
    val fs = root.getFileSystem(hconf)
    def walk(d: org.apache.hadoop.fs.Path): Unit = {
      val kids = fs.listStatus(d)
      kids.filter(_.isDirectory).foreach(st => walk(st.getPath))
      val perBucket = kids
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .groupBy { st =>
          val m = bucketId.matcher(st.getPath.getName)
          if (m.find()) m.group(1) else st.getPath.getName
        }
      perBucket.collect { case (b, fsts) if fsts.length > 1 =>
        throw new IllegalStateException(
          s"landBucketed($name): bucket $b has ${fsts.length} files in " +
            s"$d — repartition(buckets, col(key)) before landing " +
            "or the reported in-bucket ordering is unsound")
      }
      ()
    }
    walk(root)
  }

  /** The co-located equi-join of two tables landed with the SAME
    * bucket count on their join keys. This is a plain join — the value
    * is the PLAN it produces (no Exchange on either side; LayoutSpec
    * pins it on the executed plan), which only holds when both sides
    * came through [[landBucketed]] with equal `buckets`. */
  def coLocatedJoin(
      s: SparkSession,
      left: String,
      right: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    // One Dataset instance per side, and the condition built from THOSE
    // instances: fresh s.table() calls per column relied on the relation
    // cache handing back identical attribute exprIds, which a cache
    // refresh (or a self-join, where the two sides' attributes collide)
    // silently breaks. A self-join needs an alias to be unambiguous —
    // reject it rather than produce an unresolvable condition.
    require(left != right,
      s"coLocatedJoin($left, $right): self-join needs aliased sides — " +
        "read the table once and join df.as(\"l\") to df.as(\"r\")")
    val l = s.table(left)
    val r = s.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
