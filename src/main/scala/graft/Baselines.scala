package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2 #9-15: statistical baselines, the Spark re-expression of
  * the reference's percentile/temporal/login/summary/regression modules
  * (src/baselines/percentiles.py, src/baseline_modules/...). All are
  * two-level aggregations: partial per (group, slice) counts first —
  * map-side combined, one shuffle — then a small per-group profile agg.
  */
object Baselines {
  import Tables.t

  /** Hourly event counts per type — shared base for 9/10. Groups on
    * the LONG epoch-hour (integer division; identical to
    * date_trunc("hour") under the UTC session — the timeSlice
    * precedent): the per-row datetime truncation and the 8-byte
    * timestamp group key never touch the event stream, and the
    * ~|types × hours| output decorates back to epoch seconds after the
    * aggregate. `h_s` is the hour-start in epoch seconds. */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"),
        expr("CAST(ts AS LONG) DIV 3600").as("hb"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), (col("hb") * 3600L).as("h_s"), col("n"))

  /** #9 percentile profile of hourly counts per group.
    * Ref: src/baselines/percentiles.py (p2.5..p97.5 profile). */
  def baselinePercentiles(s: SparkSession, dir: String): DataFrame = {
    val ps = Seq(
      "p025" -> 0.025, "p05" -> 0.05, "p10" -> 0.10, "p25" -> 0.25,
      "p50" -> 0.50, "p75" -> 0.75, "p95" -> 0.95, "p975" -> 0.975)
    val aggs = Seq(
      count(lit(1)).as("n_hours"),
      Num.r4(avg(col("n"))).as("avg_n"),
      min(col("n")).as("min_n"),
      max(col("n")).as("max_n")) ++
      ps.map { case (name, p) =>
        Num.r4(percentile(col("n"), lit(p))).as(name)
      }
    hourly(s, dir)
      .groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("event_type"))
  }

  /** #10 outlier detection: trailing-window hourly counts vs the p95 of
    * the history window (the alerting use of the percentile baseline).
    *
    * The hourly census is MATERIALIZED before it forks: its two
    * consumers (history profile, trailing slice) filter on the DERIVED
    * hour column, so Catalyst pushes each window predicate below the
    * aggregate into its own scan — two full decodes of the event
    * stream with no reusable exchange between them (verified on the
    * plan; the windows partition the data, so together they re-read
    * everything). Checkpointing |types × hours| narrow rows replaces
    * the second scan — and is exactly the stored hourly-baseline table
    * this module maintains at scale in the reference design. */
  def baselineOutliers(s: SparkSession, dir: String): DataFrame = {
    val h = hourly(s, dir).transform(graft.Materialize.frame)
    val cutoffS = 1706140800L // 2024-01-25T00:00:00Z
    val profile = h.filter(col("h_s") < cutoffS)
      .groupBy(col("event_type"))
      .agg(Num.r4(percentile(col("n"), lit(0.95))).as("p95"))
    h.filter(col("h_s") >= cutoffS)
      .join(broadcast(profile), Seq("event_type"))
      .withColumn("outlier", col("n") > col("p95"))
      .select(col("event_type"), col("h_s"), col("n"), col("p95"),
        col("outlier"))
      .orderBy(col("event_type"), col("h_s"))
  }

  /** #11 (pivot, day-of-week, hour-of-day) activity profile — the full
    * dimensionality of the reference module (which profiles per pivot,
    * weekday, and hour). dow follows Spark's dayofweek (Sunday=1).
    * Ref: baseline_modules/temporal_by_day/module.R. */
  def temporalByDay(s: SparkSession, dir: String): DataFrame =
    // dow/hod as integer arithmetic on the LONG epoch (identical to
    // dayofweek/hour under the UTC session: 1970-01-01 is a Thursday =
    // Spark dayofweek 5, hence the +4 rotation) — the two per-row
    // datetime field extractions never touch the event stream. pmod +
    // remainder-subtract gives exact FLOOR-division semantics, so the
    // rewrite is total: pre-1970 (negative-epoch) timestamps land on
    // the correct day/hour instead of silently shifting under
    // truncate-toward-zero DIV/%.
    t(s, dir, "events")
      .withColumn("__ts_s", col("ts").cast("long"))
      .groupBy(col("event_type"),
        expr("(pmod((__ts_s - pmod(__ts_s, 86400)) DIV 86400 + 4, 7) + 1)")
          .cast("int").as("dow"),
        expr("pmod(__ts_s, 86400) DIV 3600").cast("int").as("hod"))
      .agg(
        count(lit(1)).as("n"),
        Num.r4(avg(col("value"))).as("value_avg"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"))
      .orderBy(col("event_type"), col("dow"), col("hod"))

  /** #12 per-entity activity stats. Ref: baseline_modules/login/module.R
    * (num_logins, num_days, percent_of_days, average_per_day_when_active).
    *
    * Round-20 shape, from the events-1000× stage trace the r19 VERDICT
    * asked for: the carried (user, day) census shape spent its steady
    * 5.9 s wall on [census map 3.3 s (contended with the parallel
    * ts-only totals scan) → 70M-census-row SECOND shuffle into the
    * per-user rollup 1.6 s → tail 0.8 s] — two 100M-row scans and two
    * wide exchanges for what is ONE per-user aggregate. Distinct-day
    * counting doesn't need a day census at all when the observation
    * window is bounded: active days ride the aggregate as a DAY
    * BITMASK — two longs cover a 128-day window (the reference's
    * baselines profile 30-90 days), bit_or-merged map-side like any
    * plain long aggregate, active_days = bit_count. So the whole
    * baseline is one scan → one (user) shuffle of 5-long buffers →
    * 1.5M rolled rows, and total_days derives from bit_or OVER THE
    * ROLLED ROWS (plus min/max day for the guard) — the second
    * 100M-row scan disappears entirely.
    * Guard: day offsets fold modulo 128, injective only while the
    * global span is < 128 days — asserted loudly at runtime
    * (raise_error inside the totals projection; negative spec in
    * BaselinesSpec), the packed-key-guard discipline. Wider windows
    * belong to the (user, day) census shape this replaced (kept in
    * git history), or a third mask long.
    * History the trace overturned: r18 rejected a shared user_id
    * repartition (loses map-side combine) and a census-derived totals
    * (ReuseExchange never fires); r19 shipped materialize-before-sort.
    * All three were local optima of the census shape — the bitmask
    * removes the census instead. Measured at events-1000×: 5.93 →
    * 1.85 s steady (the scan+partial stage itself dropped 3.3 →
    * 1.1 s: long-key/long-buffer aggregation, no per-row date
    * decode, ~1M-entry maps instead of 3.1M), vs the DuckDB twin's
    * 2.18 s — the row flips from 2.81× to a win. */
  def loginBaseline(s: SparkSession, dir: String): DataFrame = {
    // day number via total floor-division epoch arithmetic (the
    // temporalByDay pmod idiom — no per-row datetime extraction)
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("ts").cast("long").as("__s"))
      .select(col("user_id"),
        expr("(__s - pmod(__s, 86400)) DIV 86400").as("__d"))
      .withColumn("__h", expr("cast(pmod(__d, 128) as int)"))
    // 1.5M rolled rows materialize once: the totals aggregate, the
    // output projection AND the output sort's range sampler all read
    // the 75 MB checkpoint instead of re-running the 100M-row rollup
    val rolled = ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("bit_or(if(__h < 64, shiftleft(1L, __h), 0L))").as("__mlo"),
        expr("bit_or(if(__h >= 64, shiftleft(1L, __h - 64), 0L))")
          .as("__mhi"),
        min(col("__d")).as("__dmin"),
        max(col("__d")).as("__dmax"))
      .transform(graft.Materialize.frame)
    val totals = rolled
      .agg(
        expr("bit_count(bit_or(__mlo)) + bit_count(bit_or(__mhi))")
          .as("__tdi"),
        min(col("__dmin")).as("__gmin"),
        max(col("__dmax")).as("__gmax"))
      .select(expr(
        """if(__gmax - __gmin < 128, cast(__tdi as bigint),
          |  raise_error(concat('loginBaseline: observation span ',
          |    cast(__gmax - __gmin + 1 as string),
          |    ' days exceeds the 128-day day-bitmask window; widen ',
          |    'the mask or revert to a (user, day) census shape')))"""
          .stripMargin).as("total_days"))
    rolled
      .select(col("user_id"), col("n_events"),
        expr("cast(bit_count(__mlo) + bit_count(__mhi) as bigint)")
          .as("active_days"))
      .crossJoin(broadcast(totals))
      .withColumn("pct_days",
        Num.r4(col("active_days") / col("total_days")))
      .withColumn("avg_per_active_day",
        Num.r4(col("n_events") / col("active_days")))
      .orderBy(col("user_id"))
  }

  /** #13 first-seen/new-entity detection per (user, event_type). */
  def firstSeen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).cast("long").as("first_seen_s"))
      .withColumn("is_new", col("first_seen_s") >= lit(1706054400L)) // 2024-01-24Z
      .orderBy(col("user_id"), col("event_type"))

  /** #14 per-group summary statistics. Ref: baseline_modules/summary_stats.
    *
    * Computed over a (group, value) frequency census, not the raw rows:
    * the exact median is the expensive piece — `percentile` is an
    * ObjectHashAggregate whose partial buffers hold every input value,
    * so over raw events the shuffle carries |rows| doubles in
    * serialized buffers. Metric streams repeat values (this table:
    * ~18k distinct under 10M rows at 100x, and replication never grows
    * the value domain), so aggregate (group, value, n) first — plain
    * codegen'd counts, map-side combined — and feed `percentile`'s
    * frequency form. Worst case (all-distinct values) it degrades to
    * the same volume as the direct shape; with any repetition the
    * percentile input collapses by the duplication factor. The moments
    * become weighted sums over the census: mean = s1/n and
    * var = (s2 - s1^2/n)/(n-1) — both then 4dp-rounded like the
    * declarative twins they replace. */
  def summaryStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("f")).as("n"),
        sum(col("value") * col("f")).as("__s1"),
        sum(col("value") * col("value") * col("f")).as("__s2"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        Num.r4(percentile(col("value"), lit(0.5), col("f")))
          .as("median_value"))
      .select(col("event_type"), col("n"),
        Num.r4(col("__s1") / col("n")).as("mean_value"),
        // stddev_samp semantics: NULL for a single observation; FP
        // cancellation can drive the numerator a hair negative — clamp
        when(col("n") > 1, Num.r4(sqrt(greatest(lit(0.0),
          (col("__s2") - col("__s1") * col("__s1") / col("n")) /
            (col("n") - 1))))).as("sd_value"),
        col("min_value"), col("max_value"), col("median_value"))
      .orderBy(col("event_type"))

  /** #15 linear trend of daily counts + day-30 prediction.
    * Ref: baseline_modules/violations_linear_prediction. */
  def linearPrediction(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("day_idx"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(
        Num.r4(regr_slope(col("n"), col("day_idx"))).as("slope"),
        Num.r4(regr_intercept(col("n"), col("day_idx"))).as("icept"))
      .withColumn("predicted_day30",
        Num.r4(col("slope") * 30 + col("icept")))
      .orderBy(col("event_type"))
  }

  /** #15b closure-rate regression → predicted closeout date.
    * Ref: baseline_modules/violations_closeout_date/module.R (daily
    * counts → linear fit → day the fitted count reaches zero). The
    * division runs on the 4dp-rounded slope/intercept so both engines
    * divide bit-identical doubles. */
  def closeoutDate(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("day_idx"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(
        Num.r4(regr_slope(col("n"), col("day_idx"))).as("slope"),
        Num.r4(regr_intercept(col("n"), col("day_idx"))).as("icept"))
      .withColumn("closeout_day_idx",
        when(col("slope") < 0, Num.r4(-col("icept") / col("slope"))))
      .withColumn("closeout_date",
        when(col("slope") < 0,
          date_add(lit("2024-01-01").cast("date"),
            floor(col("closeout_day_idx")).cast("int"))))
      .orderBy(col("event_type"))
  }

  /** The generalized baseline runner (ref: src/runners/baseline_runner
    * .py + baseline_modules/temporal_by_day/module.R get_percentiles):
    * runs the percentile module over ANY (source, pivot, event-time,
    * id) combination — the reference configures modules per landing
    * table; here the same profile is a function of DataFrame + columns.
    *
    * Emits one row per pivot with two profile families, exactly like
    * the R module: `*_when_present` aggregates over days that HAD
    * activity; `*_overall` aggregates over the complete day grid
    * between the first and last day (missing days zero-filled — the
    * module's tidyr::complete), which is what makes "quiet entity
    * suddenly active" detectable. Scale: one (pivot, day) count
    * aggregation, a broadcast day-grid expansion, and two small
    * per-pivot profile aggs.
    */
  def dailyProfile(
      events: DataFrame,
      pivot: org.apache.spark.sql.Column,
      eventTime: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): DataFrame = {
    val ps = Seq("p025" -> 0.025, "p05" -> 0.05, "p10" -> 0.10,
      "p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p95" -> 0.95,
      "p975" -> 0.975)
    def profile(df: DataFrame, suffix: String): DataFrame = {
      val aggs = Seq(
        Num.r4(avg(col("num_events"))).as(s"num_events_avg_$suffix"),
        Num.r4(avg(col("num_ids"))).as(s"num_ids_avg_$suffix"),
        min(col("num_events")).as(s"num_events_min_$suffix"),
        max(col("num_events")).as(s"num_events_max_$suffix"),
        count(lit(1)).as(s"num_days_$suffix")) ++
        ps.map { case (name, p) =>
          Num.r4(percentile(col("num_events"), lit(p)))
            .as(s"num_events_${name}_$suffix")
        }
      df.groupBy(col("pivot")).agg(aggs.head, aggs.tail: _*)
    }
    val byDay = events
      .groupBy(pivot.as("pivot"), to_date(eventTime).as("day"))
      .agg(count(lit(1)).as("num_events"),
        countDistinct(id).as("num_ids"))
    // complete day grid per pivot (global bounds, zero-filled gaps)
    val bounds = byDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = byDay.select(col("pivot")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("pivot"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val expanded = grid.join(byDay, Seq("pivot", "day"), "left")
      .na.fill(0, Seq("num_events", "num_ids"))
    val dates = byDay.groupBy(col("pivot")).agg(
      min(col("day")).as("earliest_when_present"),
      max(col("day")).as("latest_when_present"))
    profile(byDay, "when_present")
      .join(profile(expanded, "overall"), Seq("pivot"))
      .join(dates, Seq("pivot"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_closeout_date" -> closeoutDate _,
    "q_baseline_percentiles" -> baselinePercentiles _,
    "q_baseline_outliers" -> baselineOutliers _,
    "q_temporal_by_day" -> temporalByDay _,
    "q_login_baseline" -> loginBaseline _,
    "q_first_seen" -> firstSeen _,
    "q_summary_stats" -> summaryStats _,
    "q_linear_prediction" -> linearPrediction _
  )

  private val HourlyCte =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_closeout_date" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), fit AS (
        |  SELECT event_type,
        |    round(regr_slope(n, day_idx), 4) AS slope,
        |    round(regr_intercept(n, day_idx), 4) AS icept
        |  FROM daily GROUP BY event_type
        |), pred AS (
        |  SELECT event_type, slope, icept,
        |    CASE WHEN slope < 0 THEN round(-icept / slope, 4) END
        |      AS closeout_day_idx
        |  FROM fit
        |)
        |SELECT event_type, slope, icept, closeout_day_idx,
        |  CASE WHEN slope < 0 THEN
        |    DATE '2024-01-01' + CAST(floor(closeout_day_idx) AS INTEGER)
        |  END AS closeout_date
        |FROM pred ORDER BY event_type""".stripMargin,
    "q_baseline_percentiles" ->
      s"""$HourlyCte
         |SELECT event_type,
         |  count(*) AS n_hours,
         |  round(avg(n), 4) AS avg_n,
         |  min(n) AS min_n, max(n) AS max_n,
         |  round(quantile_cont(n, 0.025), 4) AS p025,
         |  round(quantile_cont(n, 0.05), 4) AS p05,
         |  round(quantile_cont(n, 0.10), 4) AS p10,
         |  round(quantile_cont(n, 0.25), 4) AS p25,
         |  round(quantile_cont(n, 0.50), 4) AS p50,
         |  round(quantile_cont(n, 0.75), 4) AS p75,
         |  round(quantile_cont(n, 0.95), 4) AS p95,
         |  round(quantile_cont(n, 0.975), 4) AS p975
         |FROM hourly GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_baseline_outliers" ->
      s"""$HourlyCte, profile AS (
         |  SELECT event_type, round(quantile_cont(n, 0.95), 4) AS p95
         |  FROM hourly WHERE h < TIMESTAMP '2024-01-25'
         |  GROUP BY event_type
         |)
         |SELECT h.event_type, epoch_ns(h.h) // 1000000000 AS h_s,
         |  h.n, p.p95, h.n > p.p95 AS outlier
         |FROM hourly h JOIN profile p USING (event_type)
         |WHERE h.h >= TIMESTAMP '2024-01-25'
         |ORDER BY h.event_type, h_s""".stripMargin,

    "q_temporal_by_day" ->
      """SELECT event_type,
        |  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |  CAST(hour(ts) AS INTEGER) AS hod,
        |  count(*) AS n,
        |  round(avg(value), 4) AS value_avg,
        |  min(value) AS value_min,
        |  max(value) AS value_max
        |FROM events GROUP BY event_type, dow, hod
        |ORDER BY event_type, dow, hod""".stripMargin,

    "q_login_baseline" ->
      """WITH totals AS (
        |  SELECT count(DISTINCT CAST(ts AS DATE)) AS total_days FROM events
        |)
        |SELECT user_id,
        |  count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS active_days,
        |  max(t.total_days) AS total_days,
        |  round(count(DISTINCT CAST(ts AS DATE)) * 1.0 / max(t.total_days), 4)
        |    AS pct_days,
        |  round(count(*) * 1.0 / count(DISTINCT CAST(ts AS DATE)), 4)
        |    AS avg_per_active_day
        |FROM events CROSS JOIN totals t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_first_seen" ->
      """SELECT user_id, event_type,
        |  min(epoch_ns(ts) // 1000000000) AS first_seen_s,
        |  min(epoch_ns(ts) // 1000000000) >= 1706054400 AS is_new
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q_summary_stats" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  round(avg(value), 4) AS mean_value,
        |  round(stddev_samp(value), 4) AS sd_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  round(quantile_cont(value, 0.5), 4) AS median_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_linear_prediction" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), fit AS (
        |  SELECT event_type,
        |    round(regr_slope(n, day_idx), 4) AS slope,
        |    round(regr_intercept(n, day_idx), 4) AS icept
        |  FROM daily GROUP BY event_type
        |)
        |SELECT event_type, slope, icept,
        |  round(slope * 30 + icept, 4) AS predicted_day30
        |FROM fit ORDER BY event_type""".stripMargin
  )
}
