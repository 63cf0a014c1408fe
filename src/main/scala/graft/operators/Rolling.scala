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
}
