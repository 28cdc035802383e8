package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's SARs (search-and-respond) process-baseline pipeline
  * (src/sars/run.py + writeBack.py) re-expressed Spark-first: run.py
  * pages `raw:"columns":"path"` / `raw:"instance_id"` out of the
  * osquery_v process_events union over a [-35d, -60min) window, counts
  * hits per (process, day, instance), and writeBack.py re-creates the
  * PROCESS_BASELINE table from the result. The driver-side CSV
  * stdout/stdin plumbing and the LIMIT/OFFSET pagination loop are
  * client-side workarounds the reference needed because it computed on a
  * warehouse connection row-by-row; in Spark the whole thing is one
  * map-side-combined aggregation and a parquet overwrite — no paging, no
  * driver loop, and the baseline build survives 100 TB because nothing
  * ever leaves the executors.
  *
  * The process_events view is derived deterministically from `events`
  * (same convention as every other pack) so both queries carry full
  * DuckDB oracles.
  */
object SarsPack {
  import Tables.t

  // run.py window: event_time >= now-35d AND event_time < now-60min,
  // anchored like the other packs at 2024-01-30 12:00:00.
  private val From = "2023-12-26 12:00:00"
  private val To = "2024-01-30 11:00:00"
  // new-process detection: the trailing day vs the baseline before it
  private val DayAgo = "2024-01-29 11:00:00"

  /** osquery_v-shaped process-event view (ref sars/run.py query: columns
    * path, instance_id, NAME like 'process_events'): every second event
    * is a process event; the path cycles over 25 binaries per the
    * deterministic `k` key. Mirrored exactly by the `pe` oracle CTE. */
  def processEventsFromEvents(events: DataFrame): DataFrame =
    rawProcessEvents(events)
      .withColumn("name",
        when(col("k") % 2 === 0, "process_events").otherwise("file_events"))
      .withColumn("process", processCol(col("k") % 25))
      .withColumn("instance_id", instanceCol(col("user_id")))

  /** The numeric core of the pe view: (event_time, user_id, k). Both
    * SARs queries group and filter on columns DERIVED from these three
    * — `name` is `k % 2`, `process` is `k % 25`, `instance_id` is the
    * user id — so the per-row hot path carries only the numerics and
    * the display strings are built AFTER aggregation, over |groups|
    * rows instead of |events| (string construction and string-key
    * hashing both leave the 10M-row path; the group keys become
    * fixed-width UnsafeRow fields).
    *
    * JsonLongField kernel, not from_json/get_json_object: extracting
    * ONE typed field is the per-row hot path of both SARs queries,
    * and the byte-scan kernel does it without Jackson tokenization or
    * an InternalRow per row (~4x on the parse at 100x events;
    * from_json-parity fuzz-pinned in FuzzParitySpec). */
  private def rawProcessEvents(events: DataFrame): DataFrame =
    events.select(col("ts").as("event_time"), col("user_id"),
      graft.functions.json.longField(col("props"), "k").as("k"))

  // Display-column builders, shared by the per-row view (API parity)
  // and the post-aggregation projections. concat_ws skips a null k
  // slot exactly like grouping merges the null-k numeric group, so
  // the two paths agree on null handling (those groups are hits=0
  // rows and are filtered anyway — k is never null on this data).
  private def processCol(pnum: org.apache.spark.sql.Column) =
    concat_ws("", lit("/usr/bin/p"), pnum)
  private def instanceCol(uid: org.apache.spark.sql.Column) =
    concat_ws("", lit("i-"), uid)

  private val PeCte: String =
    """WITH pe AS (
      |  SELECT ts AS event_time, user_id,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |    CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER)
      |           % 2 = 0
      |         THEN 'process_events' ELSE 'file_events' END AS name,
      |    '/usr/bin/p' ||
      |      (CAST(json_extract_string(props, '$.k') AS INTEGER) % 25)
      |      AS process,
      |    'i-' || user_id AS instance_id
      |  FROM events
      |)""".stripMargin

  /** The baseline build (sars/run.py query): hits per (process, day,
    * instance) over the trailing window. One shuffle on the group keys,
    * partial aggregation map-side; the time window reaches the scan.
    * The NAME selection is a conditional COUNT (`hits > 0` post-agg),
    * not a pre-agg filter: every pe column derives from one json parse
    * of props, and a `name like ...` predicate would inline that parse
    * into a Filter operator BELOW the projection that parses it for
    * the grouping keys — two full parses per row (no cross-operator
    * subexpression elimination, and the filter-through-aggregate
    * pushdown re-creates the double parse if name is a grouping key).
    * Folding name into the aggregate keeps the parse in ONE projection
    * where CSE computes it once; measured 2.7 -> ~2.0 s at 100x
    * events. */
  def processBaseline(pe: DataFrame, from: String = From,
      to: String = To): DataFrame =
    pe.filter(col("event_time") >= lit(from).cast("timestamp") &&
        col("event_time") < lit(to).cast("timestamp"))
      .groupBy(
        col("process"), to_date(col("event_time")).as("day"),
        col("instance_id"))
      .agg(sum(when(col("name") === "process_events", 1L).otherwise(0L))
        .as("hits"))
      .filter(col("hits") > 0L)

  /** writeBack.py: CREATE OR REPLACE TABLE ... — a parquet overwrite. */
  def writeBack(baseline: DataFrame, path: String): Unit =
    baseline.write.mode("overwrite").parquet(path)

  /** The SAR the baseline powers: (process, instance) pairs active in
    * the trailing day that the 34-day baseline before it never saw.
    * The anti-join formulation (baseline window DISTINCT vs trailing
    * aggregate) reads and json-parses the event stream TWICE; since
    * both windows partition one scan, this is instead ONE conditional
    * aggregate over [From, To) — per (process, instance) count the
    * trailing-day hits and the baseline-window hits in the same pass,
    * keep rows with trailing > 0 and baseline = 0. One scan, one
    * shuffle on the group keys, no join at all — the shape that wins
    * at 100 TB (and 2x locally, measured at sf~1). */
  def newProcesses(pe: DataFrame): DataFrame = {
    val ts = col("event_time")
    val isProc = col("name") === "process_events"
    val inRecent = ts >= lit(DayAgo).cast("timestamp") &&
      ts < lit(To).cast("timestamp")
    val inKnown = ts >= lit(From).cast("timestamp") &&
      ts < lit(DayAgo).cast("timestamp")
    // name folded into the conditional sums, not the pre-agg filter —
    // same single-parse reasoning as processBaseline above
    pe.filter(ts >= lit(From).cast("timestamp") &&
        ts < lit(To).cast("timestamp"))
      .groupBy(col("process"), col("instance_id"))
      .agg(sum(when(isProc && inRecent, 1L).otherwise(0L)).as("hits"),
        sum(when(isProc && inKnown, 1L).otherwise(0L)).as("__known"))
      .filter(col("hits") > 0L && col("__known") === 0L)
      .select(col("process"), col("instance_id"), col("hits"))
      .orderBy(col("process"), col("instance_id"))
  }

  /** processBaseline over the events-derived view, fused: when the pe
    * view is OURS (the run.py extraction), the group keys pre-date
    * their display form — (k % 25, day, user_id) are the same
    * partitions as (process, day, instance_id), so the 10M-row path
    * groups on fixed-width numerics (cheaper UnsafeRow hashing, no
    * per-row concat) and the display strings are built once per GROUP.
    * Identical output to processBaseline(processEventsFromEvents(ev))
    * — the generic operator stays the public API for arbitrary
    * osquery-shaped frames (SarsSpec pins that contract). */
  def processBaselineFromEvents(events: DataFrame): DataFrame =
    rawProcessEvents(events)
      .filter(col("event_time") >= lit(From).cast("timestamp") &&
        col("event_time") < lit(To).cast("timestamp"))
      .groupBy((col("k") % 25).as("__p"),
        to_date(col("event_time")).as("day"), col("user_id"))
      .agg(sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("hits"))
      .filter(col("hits") > 0L)
      .select(processCol(col("__p")).as("process"), col("day"),
        instanceCol(col("user_id")).as("instance_id"), col("hits"))

  /** newProcesses over the events-derived view — same fusion as
    * [[processBaselineFromEvents]]: one scan, one numeric-key shuffle,
    * conditional window sums, display strings on the surviving rows.
    *
    * Round-19 rework (A/B'd same-JVM at events-1000×, 100M rows):
    *  - the group key packs (k%25, user_id) into ONE long
    *    (k25·2³⁵ + user_id) and BOTH conditional sums pack into one
    *    (hits·2³² + known) — one agg buffer per group and 24-byte
    *    UnsafeRow shuffle rows instead of 40, over a ~10M-partial-row
    *    exchange (steady 4.9-5.3 → 4.3-4.9 s);
    *  - the 455k surviving rows MATERIALIZE before the output sort, so
    *    the range partitioner's sampling job reads the cached result
    *    instead of re-executing the 100M-row aggregate (the second
    *    ~0.9 s final-agg stage the stage trace showed; 4.3-4.9 →
    *    3.9-4.4 s). Combined ~20% off the committed 5.49 s row.
    * Unpacks are shiftright/% (exact long bit ops — a `/` would plan
    * double division). Pack bounds are ASSERTED at runtime (round 20,
    * the Layout non-null-merge-key precedent — prose alone left a
    * silent-wrong-answer window ~3.4× above the 1000× actor space):
    * a user_id outside [0, 2³⁵) raises per row in the key projection
    * (one masked compare + a never-taken codegen branch — the cheapest
    * of three measured guard forms, see the key builder); the packed
    * sum must stay non-negative — checked post-aggregate, catching any
    * recent-hits component ≥ 2³¹. The one remaining prose-only bound
    * is the known-window carry (≥2³² known hits from ONE (process,
    * instance) pair inside 34 days bumps the hits component by 1) —
    * ~40× the total corpus from a single pair, unreachable without
    * the recent-hits assert tripping first at any realistic
    * recent:known ratio. The null-k rows group under one null key on
    * either shape and carry hits=0, filtered identically. */
  def newProcessesFromEvents(events: DataFrame): DataFrame = {
    val ts = col("event_time")
    val isProc = col("k") % 2 === 0
    val inRecent = ts >= lit(DayAgo).cast("timestamp") &&
      ts < lit(To).cast("timestamp")
    // The guard's per-row cost was measured three ways at 100M rows
    // (same host state, steady runs): unguarded 3.97 s; a two-compare
    // range test (>= 0 AND < 2^35) +~0.5 s; a branchless
    // isolate-into-reserved-bits form (DIV + pmod + clamps on every
    // row, raise moved post-agg) +~1.4 s — more alu work than a
    // compare despite no branch. THIS form — bounds checking in one
    // AND: (user_id & ~(2^35-1)) == 0 is false iff any high or sign
    // bit is set — reads 4.05 s steady, within noise of unguarded.
    // The raise_error branch is codegen'd and never taken on legal
    // data.
    val packedKey = expr(
      """if(user_id is null or (user_id & -34359738368L) = 0,
        |   (k % 25) * shiftleft(1L, 35) + user_id,
        |   raise_error(concat('newProcessesFromEvents: user_id ',
        |     cast(user_id as string), ' outside [0, 2^35) would corrupt',
        |     ' the packed (k%25, user_id) group key; widen the pack')))"""
        .stripMargin)
    val packedVal = when(isProc,
      when(inRecent, lit(1L << 32)).otherwise(lit(1L))).otherwise(lit(0L))
    rawProcessEvents(events)
      .filter(ts >= lit(From).cast("timestamp") &&
        ts < lit(To).cast("timestamp"))
      .groupBy(packedKey.as("__g"))
      .agg(sum(packedVal).as("__v"))
      .filter(expr(
        """if(__v is null or __v >= 0, true,
          |   raise_error(concat('newProcessesFromEvents: packed hit ',
          |     'counter overflowed (>= 2^31 recent hits for one ',
          |     '(process, instance) pair); split the conditional ',
          |     'sums')))""".stripMargin))
      .filter(col("__v") >= lit(1L << 32) &&
        col("__v") % lit(1L << 32) === 0L)
      .select(
        processCol(shiftright(col("__g"), 35)).as("process"),
        instanceCol(col("__g") % lit(1L << 35)).as("instance_id"),
        shiftright(col("__v"), 32).as("hits"))
      .transform(graft.Materialize.frame)
      .orderBy(col("process"), col("instance_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sars_process_baseline" -> ((s: SparkSession, dir: String) =>
      processBaselineFromEvents(t(s, dir, "events"))
        .orderBy(col("day"), col("process"), col("instance_id"))),
    "q_sars_new_process" -> ((s: SparkSession, dir: String) =>
      newProcessesFromEvents(t(s, dir, "events")))
  )

  def oracle: Map[String, String] = Map(
    "q_sars_process_baseline" ->
      s"""$PeCte
         |SELECT process, CAST(event_time AS DATE) AS day, instance_id,
         |  CAST(count(*) AS BIGINT) AS hits
         |FROM pe
         |WHERE event_time >= TIMESTAMP '$From'
         |  AND event_time < TIMESTAMP '$To'
         |  AND name LIKE 'process_events'
         |GROUP BY 1, 2, 3
         |ORDER BY day, process, instance_id""".stripMargin,
    "q_sars_new_process" ->
      s"""$PeCte, recent AS (
         |  SELECT process, instance_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM pe
         |  WHERE event_time >= TIMESTAMP '$DayAgo'
         |    AND event_time < TIMESTAMP '$To'
         |    AND name LIKE 'process_events'
         |  GROUP BY 1, 2
         |), known AS (
         |  SELECT DISTINCT process, instance_id FROM pe
         |  WHERE event_time >= TIMESTAMP '$From'
         |    AND event_time < TIMESTAMP '$DayAgo'
         |    AND name LIKE 'process_events'
         |)
         |SELECT r.process, r.instance_id, r.hits FROM recent r
         |WHERE NOT EXISTS (SELECT 1 FROM known k
         |  WHERE k.process = r.process AND k.instance_id = r.instance_id)
         |ORDER BY process, instance_id""".stripMargin
  )
}
