package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time rolling (trailing-window) aggregates: for every event, the
  * count / sum / average of the same key's events in the trailing
  * `windowSeconds` — the per-event form of sliding-window analytics
  * (rate limiting, velocity features, trailing spend) where the
  * windowed GROUP BY (q33/q34) only gives per-bucket rows. No reference
  * implementation (SURVEY.md §7.4 category).
  *
  * Plan shape: ONE hash shuffle on the key, then a sort within
  * partitions and a single running-frame window pass — `RANGE BETWEEN`
  * over the event-time seconds, so ties (equal timestamps) are peers
  * and the result is deterministic regardless of their physical order
  * (a ROWS frame would not be). At 100 TB this is the minimal shape:
  * key-partitioned exchange + per-partition sort, no self-join blowup
  * (the naive `e JOIN e ON ts BETWEEN` form shuffles |window| copies of
  * every event).
  *
  * The frame is value-based, so a skewed key (one user with millions of
  * events) serializes within its partition — mitigate upstream with the
  * per-group cap ([[Sampling.capPerGroup]]) or hot-key split
  * ([[SkewJoins]]) if a key's event count is unbounded.
  */
object Rolling {

  /** Gap-filled time-series resample: bucket each key's events to fixed
    * `bucketSeconds` intervals, aggregate per bucket, then DENSIFY the
    * series — every bucket between a key's first and last event exists
    * in the output, empty ones with `n_events = 0`, a null `sum_value`,
    * and `filled_sum` carrying the last observed bucket's sum forward
    * (the resample→ffill idiom of time-series feature pipelines;
    * windowed GROUP BY alone (q33) silently skips empty buckets, which
    * breaks anything assuming a regular grid).
    *
    * Buckets are epoch-second indices (`bucket_start` = index ·
    * `bucketSeconds`, a BIGINT) — integer arithmetic, no interval/
    * timezone semantics to disagree about across engines.
    *
    * Plan shape: the raw table shuffles ONCE (the per-bucket hash
    * aggregate, partial map-side); everything after — the per-key
    * min/max spine, the `sequence` explode, the left join back, the
    * forward-fill window — runs over BUCKET-level rows (|keys| ·
    * |buckets|, orders of magnitude smaller than the input). The spine
    * explode is map-side; its memory is one array of bucket indices per
    * key, bounded by the key's time span / `bucketSeconds` — cap with
    * `maxBucketsPerKey` (raise_error beyond it) so a pathological key
    * (one event in 1970, one today) fails loudly instead of
    * materializing a billion-element array. The default cap (1M buckets
    * ≈ a century of hourly grid, an 8 MB index array) is the largest
    * spine a single row should ever hold in executor memory.
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, bucketSeconds: Long,
               maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(bucketSeconds > 0, s"bucket must be positive, got $bucketSeconds")
    val idx = floor(unix_timestamp(col(tsCol)) / bucketSeconds).cast("long")
    val buckets = df
      // null timestamps are EXCLUDED up front (the pandas NaT-resample
      // convention) — without this filter they would form a null bucket
      // that the spine join silently drops, losing their counts with no
      // trace; an explicit filter makes the contract visible in the plan
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), idx.as("__idx"), col(valueCol).as("__v"))
      .groupBy(col(keyCol), col("__idx"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("sum_value"))
    val spine = buckets
      .groupBy(col(keyCol))
      .agg(min(col("__idx")).as("__lo"), max(col("__idx")).as("__hi"))
      .withColumn("__span", col("__hi") - col("__lo") + 1)
      .withColumn("__idx", explode(
        when(col("__span") > maxBucketsPerKey,
          raise_error(concat(lit("resample: key "), col(keyCol).cast("string"),
            lit(s" spans more than $maxBucketsPerKey buckets"))).cast("array<bigint>"))
          .otherwise(sequence(col("__lo"), col("__hi")))))
      .select(col(keyCol), col("__idx"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(buckets, Seq(keyCol, "__idx"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_sum", last(col("sum_value"), ignoreNulls = true).over(w))
      .withColumn("bucket_start", col("__idx") * bucketSeconds)
      .drop("__idx")
  }

  /** Appends `roll_count`, `roll_sum`, `roll_avg` over the trailing
    * window (inclusive of the current event's peers).
    */
  def trailingAgg(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"window must be positive, got $windowSeconds")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    df.withColumn("roll_count", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_avg", avg(col(valueCol)).over(w))
  }

  /** Per-key exponentially-weighted moving average over event order —
    * the decaying baseline behind alerting/monitoring (pandas
    * `ewm(alpha).mean()` with `adjust=False`): s₁ = x₁,
    * s_t = α·x_t + (1−α)·s_{t−1}. The recurrence is sequential BY
    * DEFINITION, so (the [[Packing.lptShards]] pattern) the KEY is the
    * parallelism unit: one hash shuffle on the key, a within-partition
    * (key, order) sort, one streaming pass carrying a single running
    * double per key — no window, no driver state, no per-pair pow
    * blowup (the closed-form Σ α(1−α)^{t−j}x_j form an external engine
    * replays is O(n²) and exists for the oracle, not for the engine).
    * A skewed key serializes within its partition — the [[trailingAgg]]
    * caveat applies. Null values are dropped (the recurrence is
    * undefined on them), null keys are a key like any other.
    * Output: (key, order, value, ewma).
    */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val prepared = df
      .filter(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key") +:
        orderCols.map(col) :+ col(valueCol).cast("double").as("value"): _*)
      // EXPLICIT partition count (the Dedup.denseBlockPairJoin
      // convention): for a sequential per-key fold the partition count
      // IS the parallelism, and a bare repartition(col) is
      // AQE-coalescible — tiny input bytes would fold the shuffle back
      // to one task and serialize every key through it
      .repartition(spark.sessionState.conf.numShufflePartitions, col("key"))
      .sortWithinPartitions(col("key") +: orderCols.map(col): _*)
    val xIdx = prepared.schema.fieldIndex("value")
    // partition-local fold (the GroupOps.exclusivePrefixSum RDD
    // handoff): rows arrive (key, order…)-sorted, one running double
    // per key, reset on key change
    val out = prepared.rdd.mapPartitions { it =>
      var cur: String = null
      var have = false
      var s = 0.0
      it.map { r =>
        val k = r.getString(0)
        val x = r.getDouble(xIdx)
        if (!have || k != cur) { cur = k; have = true; s = x }
        else s = alpha * x + (1 - alpha) * s
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(out, prepared.schema
      .add("ewma", org.apache.spark.sql.types.DoubleType, nullable = false))
  }
}
