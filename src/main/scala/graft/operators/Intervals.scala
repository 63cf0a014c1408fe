package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed spans — the gaps-and-islands family:
  * collapse overlapping/touching intervals into maximal covered spans
  * (activity sessions from padded event times, covered time-ranges from
  * per-shard scan logs, merged validity windows), and the complement
  * (the uncovered gaps between them). No reference implementation
  * (SURVEY.md §7.4 category); the reference's pandas idiom for this
  * shape is a sorted-loop in driver memory, which is exactly what does
  * not scale.
  *
  * Plan shape: ONE hash shuffle on the key, then two window passes over
  * the same (key, start, end) sort — the running `max(end)` over strictly
  * preceding rows detects island starts, a running sum numbers the
  * islands — and a final hash aggregate per island that REUSES the key
  * partitioning (no second exchange of the data; AQE coalesces). No
  * self-join, no driver state; a skewed key serializes within its
  * partition like any windowed operator — cap upstream if a key's
  * interval count is unbounded.
  *
  * Determinism: ties in (start, end) are ordered by themselves only;
  * tied rows always land in the same island (a row whose start equals a
  * peer's start can never exceed the peer's running max by more than the
  * touch rule), so island membership — and therefore the merged spans —
  * are independent of physical row order.
  */
object Intervals {

  /** Merge overlapping or touching intervals per key. Intervals are
    * `[startCol, endCol]` inclusive on numeric or timestamp columns;
    * two intervals merge iff `next.start <= running_max(end)` (touching
    * endpoints merge — pass strict = true to keep point-touching
    * intervals separate). Output: one row per maximal span with
    * `span_start`, `span_end`, `n_intervals`.
    */
  def coalesce(df: DataFrame, keys: Seq[String], startCol: String,
               endCol: String, strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    // a null endpoint would sort NULLS FIRST and silently vanish from the
    // running max, mis-merging every later interval of the key — raise at
    // the row instead (same contract style as Chunking.packedKey)
    val guarded = df.withColumn(startCol,
      when(col(startCol).isNull || col(endCol).isNull,
        raise_error(lit(s"coalesce: null $startCol/$endCol interval endpoint")))
        .otherwise(col(startCol)))
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol).asc, col(endCol).asc)
    // two steps (a window function may not nest inside another's
    // argument): materialize the running max, then number the islands
    val withPrev = guarded.withColumn("__prev_max", max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
    val opens =
      if (strict) col("__prev_max").isNull || col(startCol) >= col("__prev_max")
      else col("__prev_max").isNull || col(startCol) > col("__prev_max")
    withPrev
      .withColumn("__island", sum(when(opens, 1L).otherwise(0L))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keys.map(col) :+ col("__island"): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island", "__prev_max")
  }

  /** The complement of [[coalesce]]: the uncovered gaps strictly between
    * a key's merged spans (no gap before the first or after the last —
    * the domain is unbounded). Output: `gap_start` (= previous span end),
    * `gap_end` (= next span start) per key; gap endpoints are exclusive
    * on both sides. Runs entirely on the coalesced spans — same single
    * input shuffle, one more window pass over span-level rows.
    */
  def gaps(df: DataFrame, keys: Seq[String], startCol: String,
           endCol: String): DataFrame = {
    val spans = coalesce(df, keys, startCol, endCol)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("span_start").asc)
    spans
      .withColumn("gap_start", lag(col("span_end"), 1).over(ord))
      .filter(col("gap_start").isNotNull)
      .select(keys.map(col) :+ col("gap_start") :+
        col("span_start").as("gap_end"): _*)
  }
}
