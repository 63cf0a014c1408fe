package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GroupOps, Validation, ValidationRule}
import graft.sources.Tables

/** Event-time, windowed, funnel/session/retention and streaming-state queries (SURVEY.md §7.4 events family).
  *
  * One slice of [[graft.SparkEntry]]'s query surface (split from the
  * former 9.3k-line single file; pure move, no behavior change). Keys,
  * builders and oracle SQL are exactly the driver contract: every
  * `queries` entry that is SQL-expressible has a DuckDB `oracleSql`
  * twin with IDENTICAL column names (the compare hashes by sorted
  * column name).
  */
private[graft] object EventsStreamingQueries extends QueryRegistry {

  /** Tumbling 1-hour window aggregation over event time (batch form of the
    * Structured-Streaming window; same window() expression runs in both).
    */
  private def q33TumblingWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.withEventTime(t(s, dir, "events"))
    ev.groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }


  /** Sliding-window counts (1h window / 15m slide) — batch form of the
    * streaming sliding window; each event lands in 4 windows.
    */
  private def q34SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    EventStreams.slidingCounts(EventStreams.withEventTime(t(s, dir, "events")))
      .select(col("window_start").cast("string").as("window_start"), col("n_events"))
      .orderBy(col("window_start"))
  }


  /** Session windows per user (30-minute gap), batch form. Session start
    * reported as the raw ns epoch so both engines compare integers.
    */
  private def q35SessionWindow(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    EventStreams.sessionCounts(EventStreams.withEventTime(t(s, dir, "events")))
      // µs granularity: DuckDB reads parquet TIMESTAMP(NANOS) at µs.
      // Integer div — double division is ±1µs lossy at epoch-ns scale.
      .withColumn("session_start_us", expr("session_start_ns div 1000"))
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
  }


  /** Conversion funnel view → click → purchase: users whose greedy
    * event chain reaches each stage (strictly increasing event time).
    * One shuffle on the user key + a sorted per-user fold — no k-way
    * self-join. The oracle chains strict-min subqueries per stage.
    */
  private def q84Funnel(s: SparkSession, dir: String): DataFrame = {
    val steps = Seq("view", "click", "purchase")
    val events = graft.sources.Tables.withEventTime(t(s, dir, "events"))
    graft.operators.Funnel.conversionFunnel(
        events, "user_id", "event_time", "event_type", steps)
      .orderBy(col("step"))
  }


  /** Funnel per-user state audit, run by Bench OUTSIDE q84's timed
    * region (an extra shuffle+aggregate inside the timing skewed
    * cross-round q84 comparisons): the `maxEventsPerUser=1M` guard is
    * sized from a MEASURED high-water mark at every bench scale point,
    * so a scale-up that erodes the headroom shows up in the log, not as
    * a surprise raise_error three decades later.
    */
  def funnelStateAudit(s: SparkSession, dir: String): Unit = {
    val steps = Seq("view", "click", "purchase")
    val events = graft.sources.Tables.withEventTime(t(s, dir, "events"))
    val hw = graft.operators.Funnel
      .stateHighWater(events, "user_id", "event_type", steps).head()
    // with zero step events the global max aggregates to NULL, which
    // getAs[Long] unboxes to 0 — guard it rather than log headroom=∞
    val max = hw.getAs[Long]("max_events_per_user")
    if (hw.isNullAt(hw.fieldIndex("max_events_per_user")) || max == 0L)
      println("[q84] funnel per-user state high-water: no step events")
    else
      println(f"[q84] funnel per-user state high-water: max=$max%d " +
        f"p99=${hw.getAs[Double]("p99_events_per_user")}%.0f " +
        f"mean=${hw.getAs[Double]("mean_events_per_user")}%.1f " +
        f"headroom=${1000000.0 / max}%.0fx vs maxEventsPerUser=1000000")
  }


  /** First-order Markov transition matrix of event types per user:
    * consecutive-pair counts via one lead window (no self-join), row
    * probabilities normalized within the from-state over the
    * |states|²-row result.
    */
  private def q100Transitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(
        Tables.withEventTime(t(s, dir, "events")),
        "user_id", "event_time", "event_type", tieBreak = "event_id")
      .select(col("from_state"), col("to_state"), col("n_transitions"),
        round(col("p"), 6).as("p"))
      .orderBy(col("from_state"), col("to_state"))


  /** Cohort retention from persisted-shape bitmap sketches: per
    * event_type, one bitmap of first-half users and one of second-half
    * users (conditional build — nulls skip), then |A ∩ B| via
    * `bitmap_and_cardinality`'s wire-format chunk merge-join
    * ([[graft.expressions.BitmapAndCardinality]]) — the
    * audience-overlap question answered without a raw-key self-join.
    * Exact, so the oracle is the plain DISTINCT-users intersection.
    */
  private def q127Retention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    ev.groupBy(col("event_type"))
      .agg(
        call_function("bitmap_build",
          when(col("event_time") < cut, col("user_id"))).as("a"),
        call_function("bitmap_build",
          when(col("event_time") >= cut, col("user_id"))).as("b"))
      .select(col("event_type"),
        call_function("bitmap_cardinality", col("a")).as("users_p1"),
        call_function("bitmap_cardinality", col("b")).as("users_p2"),
        call_function("bitmap_and_cardinality", col("a"), col("b")).as("retained"))
      .withColumn("retention_rate",
        round(col("retained") / col("users_p1"), 6))
      .orderBy(col("event_type"))
  }


  /** Session-path mining ([[graft.operators.Funnel.sessionPaths]]):
    * 30-minute-gap sessionization + whole-journey frequency counts —
    * the path-level complement to q100's one-step Markov matrix. All
    * orderings tie-break on event_id, so the oracle replays
    * gaps-and-islands, ordered path assembly and the top-20 exactly.
    */
  private def q143SessionPaths(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
    Funnel.sessionPaths(ev, "user_id", "ts", "event_type", "event_id", topK = 20)
      .orderBy(col("n_sessions").desc, col("path").asc)
  }


  /** Rolling 7-day active users off the daily bitmap sketch table
    * ([[graft.operators.Sketches.rollingDistinct]]): every trailing
    * window is a union of ≤ 7 KB-sized day sketches — the fact table
    * is scanned once for any window length, where the naive
    * range-join re-shuffles it per window day. Exact, so the oracle
    * is the plain rolling COUNT(DISTINCT).
    */
  private def q144RollingMau(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
    val shards = Sketches.bitmapShards(ev,
      Seq(to_date(col("event_time")).as("day")), col("user_id"))
    Sketches.rollingDistinct(shards, "day", windowDays = 7)
      .select(col("day"), col("n_distinct"))
      .orderBy(col("day"))
  }


  /** Weekly cohort retention matrix
    * ([[graft.operators.Sketches.cohortRetention]]): first-activity
    * week defines each user's cohort; every (cohort × week-offset)
    * cell is one KB-sized bitmap intersection — q127's retention
    * generalized to the full product-analytics triangle, with no
    * per-cell re-scan. Exact, so the oracle is the plain
    * membership-join COUNT(DISTINCT) matrix.
    */
  private def q145CohortMatrix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
      .withColumn("week", date_trunc("week", col("event_time")).cast("date"))
    Sketches.cohortRetention(ev, "user_id", "week", periodDays = 7, maxOffset = 4)
      .orderBy(col("cohort"), col("week_offset"))
  }


  /** Conversion-lag percentiles
    * ([[graft.operators.Funnel.conversionLag]]): time from first view
    * to the greedy-earliest purchase completion for q84's converters,
    * in exact microseconds with exact-interpolated percentiles — the
    * funnel COUNT turned into an SLA. The oracle restates the
    * strict-min chaining CTEs (the q84 convention) and quantile_cont.
    */
  private def q146ConversionLag(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
    Funnel.conversionLag(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("n_converters"),
        round(col("p50_us"), 6).as("p50_us"),
        round(col("p90_us"), 6).as("p90_us"),
        col("max_us"))
  }


  /** Outer purchase attribution — q48's interval join as LEFT OUTER
    * ([[graft.streaming.EventStreams.purchaseAttribution]] with
    * `left_outer`): every purchase, attributed view or not; null
    * `view_id` rows are the conversions with no marketing touch in the
    * lookback, the number a channel-mix dashboard reads next to q48's
    * attributed set. Same streaming-legal shape (both sides
    * watermarked; outer rows emit when the watermark closes the
    * window); the batch oracle is the plain LEFT JOIN restatement.
    */
  private def q156UnattributedPurchases(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = EventStreams.withEventTime(t(s, dir, "events"))
    EventStreams.purchaseAttribution(ev, "30 minutes", "left_outer")
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        round(col("value"), 4).as("purchase_value"))
      .orderBy(col("purchase_id"), col("view_id"))
  }


  /** Bot-rate gate over the event stream: per user, the peak number of
    * events inside ANY sliding 24-hour window (RANGE frame over epoch
    * seconds — the q76 rolling machinery pointed at abuse detection)
    * plus the total event count, flagged when the burst exceeds the
    * rate threshold (9/day trips 11 of 150 users at sf0.01 — both flag
    * values carry real population). The oracle replays the identical
    * RANGE window in DuckDB over integer epoch seconds.
    */
  private def q166BotRateGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `div`, not `/`: ns magnitudes overflow double-precision exactness
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("user_id"), expr("ts div 1000000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-86399, Window.currentRow)
    ev.withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("burst").as("max_burst_24h"))
      .withColumn("bot_flag", (col("max_burst_24h") >= 9).cast("boolean"))
      .orderBy(col("user_id"))
  }


  /** A/B gate ([[graft.operators.Funnel.abTestGate]]): users hash-split
    * into two variants by user_id parity, the experiment unit is the
    * USER-DAY (daily exposure; converts if that day saw a purchase —
    * per-user "ever purchased" saturates to pool = 1 on this corpus and
    * has no variance to test); the pooled two-proportion z-test as one
    * row of exact arithmetic the oracle restates verbatim.
    */
  private def q180AbTest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Funnel
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("user_id").isNotNull)
      .withColumn("unit",
        concat_ws("|", col("user_id"), to_date(col("event_time"))))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    Funnel.abTestGate(ev, "unit", "variant", "event_type", "purchase")
      .select(col("variant_a"), col("variant_b"), col("n_a"), col("n_b"),
        col("conv_a"), col("conv_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("z"), 6).as("z"), col("significant"))
  }


  /** Per-segment metric trend ([[graft.operators.GroupOps.trendSlopes]]):
    * OLS slope of event value on day index per event type — "is this
    * metric drifting, how fast, where". x is centered at 2024-01-01:
    * epoch-day magnitudes would make n·Σx²−(Σx)² catastrophically
    * cancel and no 6-dp cross-engine parity could survive; centered,
    * the sums are benign and DuckDB restates them exactly.
    */
  private def q187TrendSlopes(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .filter(col("value").isNotNull)
      .withColumn("day_idx",
        datediff(to_date(col("event_time")), lit("2024-01-01").cast("date")))
    GroupOps.trendSlopes(ev, Seq("event_type"), "day_idx", "value")
      .select(col("event_type"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
      .orderBy(col("event_type"))
  }


  /** Batch form of [[graft.streaming.EventStreams.statefulUserAgg]] —
    * the mapGroupsWithState escape hatch run in batch mode (state
    * starts empty, each group folds once), so the custom state-fold
    * arithmetic and encoders are ORACLE-pinned against the plain
    * GROUP BY restatement; the cross-micro-batch state RESUME behavior
    * stays pinned by EventStreamsSpec's fold tests.
    */
  private def q153StatefulAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.statefulUserAgg(ev)
      .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
        round(col("maxValue"), 6).as("max_value"))
      .orderBy(col("user_id"))
  }


  /** Schema-drift ingest gate ([[graft.operators.GroupOps.profileDiff]]):
    * the first-half events profile diffed against a second half whose
    * upstream "changed their export" — `props` dropped, a derived
    * `value2` added — classifying added/removed columns and per-column
    * null-rate / distinct movement. Both profiles and the
    * classification are exact arithmetic, so the oracle restates the
    * per-column UNION ALL profiles and the full-outer classification
    * verbatim.
    */
  private def q154ProfileDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GroupOps
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val cut = lit("2024-01-15").cast("timestamp")
    val oldS = ev.filter(col("event_time") < cut)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val newS = ev.filter(col("event_time") >= cut)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("value2", round(col("value") * 2, 2))
    GroupOps.profileDiff(oldS, newS)
      .orderBy(col("column_name"))
  }


  /** Seasonal-baseline anomaly rows
    * ([[graft.operators.Drift.seasonalAnomalies]]): first-half events
    * define a per-(event_type, hour-of-day) normal band, second-half
    * rows outside 3 sample deviations are flagged — the per-row alert
    * complement to q125's distribution gate, seasonally conditioned so
    * 3 a.m. is judged against 3 a.m. history. Mean/stddev_samp/z are
    * exact arithmetic DuckDB restates (q82's stddev parity precedent).
    */
  private def q155SeasonalAnomalies(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Drift
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .withColumn("hour_of_day", hour(col("event_time")).cast("long"))
    val cut = lit("2024-01-15").cast("timestamp")
    Drift.seasonalAnomalies(
        ev.filter(col("event_time") < cut),
        ev.filter(col("event_time") >= cut),
        idCols = Seq("event_id"), groupCols = Seq("event_type"),
        seasonCol = "hour_of_day", valueCol = "value", zThreshold = 3.0)
      .select(col("event_id"), col("event_type"), col("hour_of_day"),
        col("value"), round(col("z"), 6).as("z"))
      .orderBy(col("event_id"))
  }


  /** Batch form of [[graft.streaming.EventStreams.windowedHeavyHitters]]
    * (same expression graph; `withWatermark` is a no-op in batch) —
    * the q33–q35 stream==batch pattern applied to the Misra–Gries
    * windowed aggregate so its TypedImperativeAggregate partial-merge
    * arithmetic is ORACLE-pinned, not just spec-pinned. capacity 8 ≥ 5
    * distinct event types puts MG in its exact regime (no decrement
    * ever fires), so the exploded candidate list must equal the exact
    * per-window counts in MG's (est desc, item asc) order — any
    * merge-path corruption shows up as a wrong count. The sub-capacity
    * sketch regime keeps its guarantee spec (MisraGriesSpec) and q83's
    * re-counted oracle.
    */
  private def q148WindowedHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.windowedHeavyHitters(ev, "event_type", "1 day", capacity = 8)
      .select(col("window_start").cast("string").as("window_start"),
        posexplode(col("heavy")))
      .select(col("window_start"), col("pos").cast("long").as("rank"),
        col("col.item").as("item"), col("col.est").as("n_events"))
      .orderBy(col("window_start"), col("rank"))
  }


  /** Batch form of [[graft.streaming.EventStreams.windowedDistinct]] —
    * the exact roaring-bitmap distinct per tumbling day window,
    * oracle-pinned against the plain COUNT(DISTINCT): the bitmap
    * build/merge wire format must reproduce the exact count per
    * window (the streaming state store folds the same partial buffers).
    */
  private def q149WindowedDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    val ev = Tables.withEventTime(t(s, dir, "events"))
    EventStreams.windowedDistinct(ev, "user_id", "1 day")
      .select(col("window_start").cast("string").as("window_start"),
        col("n_distinct"))
      .orderBy(col("window_start"))
  }


  /** Batch form of [[graft.streaming.EventStreams.windowedQuantiles]] —
    * per-day DDSketch p50/p95/p99, oracle-pinned with the q120 BANDED
    * pattern: DuckDB restates the exact rank-order statistics per
    * window (the sketch's own rank convention) and the within_alpha
    * verdicts assert the α = 1% bin-midpoint guarantee — a theorem
    * unless the windowed sketch build/merge is broken.
    */
  private def q150WindowedQuantiles(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.withEventTime(t(s, dir, "events"))
    val wq = EventStreams.windowedQuantiles(ev, "value", "1 day")
      .select(col("window_start"), col("p50"), col("p95"), col("p99"))
    val vals = ev.filter(col("value").isNotNull && !isnan(col("value")))
      .select(window(col("event_time"), "1 day").getField("start").as("window_start"),
        col("value"))
    val ranked = vals
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("window_start")).orderBy(col("value"))))
      .join(broadcast(vals.groupBy(col("window_start"))
        .agg(count(lit(1)).as("n"))), Seq("window_start"))
    def rankOf(q: Double): Column = floor(lit(q) * (col("n") - 1) + 0.5) + 1
    val exact = ranked
      .filter(col("rn") === rankOf(0.5) || col("rn") === rankOf(0.95) ||
        col("rn") === rankOf(0.99))
      .groupBy(col("window_start"))
      .agg(
        max(when(col("rn") === rankOf(0.5), col("value"))).as("__e50"),
        max(when(col("rn") === rankOf(0.95), col("value"))).as("__e95"),
        max(when(col("rn") === rankOf(0.99), col("value"))).as("__e99"))
    def band(est: String, ex: String): Column =
      abs(col(est) - col(ex)) <= abs(col(ex)) * lit(0.01) + lit(1e-9)
    wq.join(exact, Seq("window_start"))
      .select(col("window_start").cast("string").as("window_start"),
        round(col("__e50"), 6).as("exact_p50"),
        round(col("__e95"), 6).as("exact_p95"),
        round(col("__e99"), 6).as("exact_p99"),
        band("p50", "__e50").as("p50_within_alpha"),
        band("p95", "__e95").as("p95_within_alpha"),
        band("p99", "__e99").as("p99_within_alpha"))
      .orderBy(col("window_start"))
  }


  /** Decaying monitoring baseline ([[graft.operators.Rolling.ewma]]):
    * per-event-type EWMA of value over event order (α = 0.1, the
    * pandas `ewm(adjust=False)` recurrence) — computed as the
    * partition-local streaming fold; the oracle replays it as the
    * O(n²) closed-form power sum (fine at oracle scale, exists only
    * for the replay — measured agreement 4e-14 worst-case).
    */
  private def q234Ewma(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Rolling
    val ev = Tables.withEventTime(t(s, dir, "events"))
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    Rolling.ewma(ev, "event_type", Seq("ts", "event_id"), "value", alpha = 0.1)
      .select(col("key").as("event_type"), col("event_id"),
        round(col("ewma"), 6).as("ewma"))
      .orderBy(col("event_type"), col("event_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_tumbling_window" -> (q33TumblingWindow _),
    "q34_sliding_window" -> (q34SlidingWindow _),
    "q35_session_window" -> (q35SessionWindow _),
    "q84_funnel" -> (q84Funnel _),
    "q100_transitions" -> (q100Transitions _),
    "q127_retention" -> (q127Retention _),
    "q143_session_paths" -> (q143SessionPaths _),
    "q144_rolling_mau" -> (q144RollingMau _),
    "q145_cohort_matrix" -> (q145CohortMatrix _),
    "q146_conversion_lag" -> (q146ConversionLag _),
    "q148_windowed_heavy_hitters" -> (q148WindowedHeavyHitters _),
    "q149_windowed_distinct" -> (q149WindowedDistinct _),
    "q150_windowed_quantiles" -> (q150WindowedQuantiles _),
    "q153_stateful_agg" -> (q153StatefulAgg _),
    "q154_profile_diff" -> (q154ProfileDiff _),
    "q155_seasonal_anomalies" -> (q155SeasonalAnomalies _),
    "q156_unattributed" -> (q156UnattributedPurchases _),
    "q166_bot_rate_gate" -> (q166BotRateGate _),
    "q180_ab_test" -> (q180AbTest _),
    "q187_trend_slopes" -> (q187TrendSlopes _),
    "q234_ewma" -> (q234Ewma _))

  def oracleSql: Map[String, String] = Map(
    "q33_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q34_sliding_window" ->
      """SELECT CAST(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS VARCHAR) AS window_start,
        | count(*) AS n_events
        |FROM events, unnest([0, 1, 2, 3]) AS u(k)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q35_session_window" ->
      """SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
        |FROM (
        | SELECT user_id, epoch_us(ts) AS us,
        |  sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM (SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |       FROM events) g) s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    // q84: greedy chain = strict-min chaining, stage by stage
    "q84_funnel" ->
      """WITH s1 AS (
        | SELECT user_id, min(ts) AS t1 FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        | WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (
        | SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        | WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT step, step_name, n_users FROM (
        | SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1
        | UNION ALL SELECT 2, 'click', count(*) FROM s2
        | UNION ALL SELECT 3, 'purchase', count(*) FROM s3) t
        |ORDER BY step""".stripMargin,
    // q100: identical lead window (event_id tie-break) + from-state
    // normalization over the aggregated matrix
    "q100_transitions" ->
      """WITH t AS (
        | SELECT event_type AS from_state,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
        | FROM events)
        |SELECT from_state, to_state, count(*) AS n_transitions,
        | round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_state), 6) AS p
        |FROM t WHERE to_state IS NOT NULL
        |GROUP BY from_state, to_state
        |ORDER BY from_state, to_state""".stripMargin,
    // q127: the bitmap intersection is exact, so the oracle is the plain
    // distinct-user intersection across the two halves
    "q127_retention" ->
      """WITH p1 AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE ts < TIMESTAMP '2024-01-15'),
        |p2 AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE ts >= TIMESTAMP '2024-01-15'),
        |a AS (SELECT event_type, count(*) AS n1 FROM p1 GROUP BY 1),
        |b AS (SELECT event_type, count(*) AS n2 FROM p2 GROUP BY 1),
        |r AS (SELECT p1.event_type, count(*) AS ret
        |      FROM p1 JOIN p2 USING (event_type, user_id) GROUP BY 1)
        |SELECT a.event_type, a.n1 AS users_p1, b.n2 AS users_p2,
        | coalesce(r.ret, 0) AS retained,
        | round(CAST(coalesce(r.ret, 0) AS DOUBLE) / a.n1, 6) AS retention_rate
        |FROM a JOIN b USING (event_type) LEFT JOIN r USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q143: gaps-and-islands sessionization (30-min inactivity), ordered
    // string_agg path assembly with event_id tie-breaks, top-20 paths
    "q143_session_paths" ->
      """WITH m AS (
        | SELECT user_id, event_id, event_type, ts,
        |  CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS nw
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, event_id, event_type, ts,
        |  sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        | FROM m),
        |p AS (
        | SELECT user_id, sess,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        | FROM s GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path ASC
        |LIMIT 20""".stripMargin,
    // q144: the bitmap windows are exact, so the oracle is the plain
    // rolling COUNT(DISTINCT) over a trailing 7-day range join
    "q144_rolling_mau" ->
      """WITH du AS (
        | SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_distinct
        |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q145: the bitmap matrix is exact — oracle = membership-join
    // COUNT(DISTINCT) per (cohort, offset); Monday-truncated weeks in
    // both engines, offsets exact multiples of 7 days
    "q145_cohort_matrix" ->
      """WITH act AS (
        | SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS period, user_id
        | FROM events WHERE user_id IS NOT NULL),
        |coh AS (SELECT user_id, min(period) AS cohort FROM act GROUP BY 1),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM coh GROUP BY 1),
        |cells AS (
        | SELECT cs.cohort,
        |  CAST(datediff('day', cs.cohort, p.period) / 7 AS BIGINT) AS week_offset
        | FROM cs, (SELECT DISTINCT period FROM act) p
        | WHERE datediff('day', cs.cohort, p.period) BETWEEN 0 AND 28),
        |r AS (
        | SELECT c.cohort,
        |  CAST(datediff('day', c.cohort, a.period) / 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS retained
        | FROM coh c JOIN act a ON a.user_id = c.user_id
        | WHERE datediff('day', c.cohort, a.period) BETWEEN 0 AND 28
        | GROUP BY 1, 2)
        |SELECT cells.cohort, cells.week_offset, cs.cohort_size,
        | CAST(coalesce(r.retained, 0) AS BIGINT) AS retained,
        | round(CAST(coalesce(r.retained, 0) AS DOUBLE) / cs.cohort_size, 6) AS rate
        |FROM cells
        |JOIN cs USING (cohort)
        |LEFT JOIN r ON r.cohort = cells.cohort AND r.week_offset = cells.week_offset
        |ORDER BY cells.cohort, cells.week_offset""".stripMargin,
    // q146: the q84 strict-min chaining CTEs carried through to times —
    // lags in exact integer microseconds, quantile_cont percentiles
    "q146_conversion_lag" ->
      """WITH e AS (
        | SELECT user_id, event_type, ts FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |a AS (SELECT user_id, min(ts) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.ts) AS t2, min(a.t1) AS t1
        |      FROM e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t3, min(b.t1) AS t1
        |      FROM e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1),
        |d AS (SELECT epoch_us(t3) - epoch_us(t1) AS lag_us FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_converters,
        | round(quantile_cont(lag_us, 0.5), 6) AS p50_us,
        | round(quantile_cont(lag_us, 0.9), 6) AS p90_us,
        | CAST(max(lag_us) AS BIGINT) AS max_us
        |FROM d""".stripMargin,
    // q148: MG at capacity >= distinct items degenerates to exact
    // per-window counts in (est desc, item asc) order — restated as a
    // ranked GROUP BY; rank is posexplode's 0-based position
    "q148_windowed_heavy_hitters" ->
      """WITH c AS (
        | SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        |  event_type AS item, count(*) AS n
        | FROM events GROUP BY 1, 2)
        |SELECT window_start,
        | CAST(row_number() OVER (PARTITION BY window_start
        |   ORDER BY n DESC, item ASC) - 1 AS BIGINT) AS rank,
        | item, CAST(n AS BIGINT) AS n_events
        |FROM c
        |ORDER BY window_start, rank""".stripMargin,
    // q149: exact bitmap distinct per tumbling day == plain
    // COUNT(DISTINCT) per day
    "q149_windowed_distinct" ->
      """SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        | count(DISTINCT user_id) AS n_distinct
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q150: the q120 banded pattern per day window — exact rank-order
    // statistics at rank floor(q*(n-1)+0.5), verdicts asserted TRUE
    "q150_windowed_quantiles" ->
      """WITH v AS (
        | SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS window_start,
        |  value AS v
        | FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        |r AS (
        | SELECT window_start, v,
        |  row_number() OVER (PARTITION BY window_start ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY window_start) AS n
        | FROM v)
        |SELECT window_start,
        | round(max(CASE WHEN rn = CAST(floor(0.5 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p50,
        | round(max(CASE WHEN rn = CAST(floor(0.95 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p95,
        | round(max(CASE WHEN rn = CAST(floor(0.99 * (n - 1) + 0.5) AS BIGINT) + 1 THEN v END), 6) AS exact_p99,
        | TRUE AS p50_within_alpha, TRUE AS p95_within_alpha,
        | TRUE AS p99_within_alpha
        |FROM r GROUP BY window_start
        |ORDER BY window_start""".stripMargin,
    // q153: the mapGroupsWithState fold in batch mode == plain GROUP BY
    "q153_stateful_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | round(max(value), 6) AS max_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // q154: both per-column profiles as UNION ALL rows, full-outer
    // classification (added/removed/common), null rates + distincts
    "q154_profile_diff" ->
      """WITH o AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |nw AS (
        | SELECT event_id, user_id, event_type, value,
        |  round(value * 2, 2) AS value2
        | FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
        |po AS (
        | SELECT 'event_id' AS column_name, count(*) - count(event_id) AS nn,
        |  count(DISTINCT event_id) AS nd, count(*) AS n FROM o
        | UNION ALL SELECT 'user_id', count(*) - count(user_id),
        |  count(DISTINCT user_id), count(*) FROM o
        | UNION ALL SELECT 'event_type', count(*) - count(event_type),
        |  count(DISTINCT event_type), count(*) FROM o
        | UNION ALL SELECT 'value', count(*) - count(value),
        |  count(DISTINCT value), count(*) FROM o
        | UNION ALL SELECT 'props', count(*) - count(props),
        |  count(DISTINCT props), count(*) FROM o),
        |pn AS (
        | SELECT 'event_id' AS column_name, count(*) - count(event_id) AS nn,
        |  count(DISTINCT event_id) AS nd, count(*) AS n FROM nw
        | UNION ALL SELECT 'user_id', count(*) - count(user_id),
        |  count(DISTINCT user_id), count(*) FROM nw
        | UNION ALL SELECT 'event_type', count(*) - count(event_type),
        |  count(DISTINCT event_type), count(*) FROM nw
        | UNION ALL SELECT 'value', count(*) - count(value),
        |  count(DISTINCT value), count(*) FROM nw
        | UNION ALL SELECT 'value2', count(*) - count(value2),
        |  count(DISTINCT value2), count(*) FROM nw)
        |SELECT coalesce(po.column_name, pn.column_name) AS column_name,
        | CASE WHEN po.column_name IS NULL THEN 'added'
        |      WHEN pn.column_name IS NULL THEN 'removed'
        |      ELSE 'common' END AS status,
        | round(CAST(po.nn AS DOUBLE) / po.n, 6) AS null_rate_old,
        | round(CAST(pn.nn AS DOUBLE) / pn.n, 6) AS null_rate_new,
        | CAST(po.nd AS BIGINT) AS distinct_old,
        | CAST(pn.nd AS BIGINT) AS distinct_new
        |FROM po FULL JOIN pn ON po.column_name = pn.column_name
        |ORDER BY column_name""".stripMargin,
    // q155: per-(event_type, hour) baseline mean/stddev_samp from the
    // first half, |z| >= 3 rows from the second; degenerate baselines
    // (n < 2 or zero variance) never flag
    "q155_seasonal_anomalies" ->
      """WITH b AS (
        | SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
        |  value
        | FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |c AS (
        | SELECT event_id, event_type,
        |  CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day, value
        | FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
        |st AS (
        | SELECT event_type, hour_of_day, avg(value) AS m,
        |  stddev_samp(value) AS s, count(value) AS n
        | FROM b GROUP BY 1, 2)
        |SELECT event_id, c.event_type, c.hour_of_day, value,
        | round((value - m) / s, 6) AS z
        |FROM c JOIN st USING (event_type, hour_of_day)
        |WHERE n >= 2 AND s > 0 AND abs((value - m) / s) >= 3
        |ORDER BY event_id""".stripMargin,
    // q156: q48's interval join as LEFT OUTER — unattributed purchases
    // keep a row with null view_id
    "q156_unattributed" ->
      """WITH v AS (
        | SELECT user_id AS v_user, ts AS view_time, event_id AS view_id
        | FROM events WHERE event_type = 'view'),
        |p AS (
        | SELECT user_id AS p_user, ts AS purchase_time,
        |  event_id AS purchase_id, value
        | FROM events WHERE event_type = 'purchase')
        |SELECT purchase_id, view_id, p_user AS user_id,
        | round(value, 4) AS purchase_value
        |FROM p LEFT JOIN v
        | ON p_user = v_user AND view_time <= purchase_time
        | AND view_time >= purchase_time - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin,
    // q166: identical RANGE window over integer epoch seconds
    // (epoch_us // 1e6 — integer micros, no double rounding)
    "q166_bot_rate_gate" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events),
        |b AS (
        | SELECT user_id, count(*) OVER (
        |   PARTITION BY user_id ORDER BY sec
        |   RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW) AS burst
        | FROM ev)
        |SELECT user_id, count(*) AS n_events, max(burst) AS max_burst_24h,
        | max(burst) >= 9 AS bot_flag
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q180: the pooled two-proportion z restated with the engine's
    // exact operation order so every double is bit-identical
    "q180_ab_test" ->
      """WITH units AS (
        | SELECT user_id, CAST(ts AS DATE) AS day, user_id % 2 AS v,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
        |bv AS (SELECT v, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
        |       FROM units GROUP BY 1),
        |a AS (SELECT n, c FROM bv WHERE v = (SELECT min(v) FROM bv)),
        |b AS (SELECT n, c FROM bv WHERE v = (SELECT max(v) FROM bv)),
        |z AS (SELECT
        |  (a.c / a.n - b.c / b.n) /
        |  sqrt(((a.c + b.c) / (a.n + b.n)) * (1 - (a.c + b.c) / (a.n + b.n))
        |       * (1.0 / a.n + 1.0 / b.n)) AS zval,
        |  a.n AS n_a, b.n AS n_b, a.c AS conv_a, b.c AS conv_b
        | FROM a CROSS JOIN b)
        |SELECT (SELECT min(v) FROM bv) AS variant_a,
        | (SELECT max(v) FROM bv) AS variant_b,
        | n_a, n_b, conv_a, conv_b,
        | round(conv_a / n_a, 6) AS p_a, round(conv_b / n_b, 6) AS p_b,
        | round(zval, 6) AS z,
        | abs(zval) > 1.959963984540054 AS significant
        |FROM z""".stripMargin,
    "q187_trend_slopes" ->
      """WITH e AS (
        | SELECT event_type,
        |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |  value AS y
        | FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(x AS DOUBLE)) AS sx, sum(y) AS sy,
        |  sum(CAST(x AS DOUBLE) * y) AS sxy,
        |  sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx
        | FROM e GROUP BY 1)
        |SELECT event_type, n,
        | round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |   THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
        | round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |   THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
        |  END, 6) AS intercept
        |FROM s ORDER BY event_type""".stripMargin,
    // q234: the EWMA recurrence replayed as the closed-form power sum
    // s_t = 0.9^(t-1)·x_1 + Σ 0.1·0.9^(t-j)·x_j over an rn self-join
    "q234_ewma" ->
      """WITH e AS (
        | SELECT event_type, event_id, CAST(value AS DOUBLE) AS x,
        |  CAST(row_number() OVER (PARTITION BY event_type
        |       ORDER BY ts, event_id) AS BIGINT) AS rn
        | FROM events WHERE value IS NOT NULL),
        |s AS (
        | SELECT a.event_type, a.event_id,
        |  sum(CASE WHEN b.rn = 1 THEN power(0.9, a.rn - 1) * b.x
        |           ELSE 0.1 * power(0.9, a.rn - b.rn) * b.x END) AS ewma
        | FROM e a JOIN e b
        |   ON a.event_type = b.event_type AND b.rn <= a.rn
        | GROUP BY 1, 2)
        |SELECT event_type, event_id, round(ewma, 6) AS ewma FROM s
        |ORDER BY event_type, event_id""".stripMargin)
}
