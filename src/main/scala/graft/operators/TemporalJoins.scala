package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — as-of join and
  * point-in-interval (range) join. Built by composition of built-in
  * operators (SURVEY.md §4.3 ladder rung (a)): both reduce to ONE shuffle
  * on the join key / bucket, which is the property that matters at 100 TB —
  * never a per-row range probe or an O(|L|·|R|) nested loop.
  */
object TemporalJoins {

  /** Backward as-of join (pandas merge_asof / DuckDB `ASOF JOIN`
    * semantics): for every left row, attach `valueCols` from the LATEST
    * right row with `right.timeCol <= left.timeCol`, matching on `keys`.
    *
    * Union–sort–forward-fill composition: tag sides, union by name, one
    * window per key ordered by (time, right-before-left at equal time,
    * tieCol), ffill the right value columns, keep left rows. One shuffle
    * on `keys`; state per group is one row of carried values — the same
    * trick a streaming as-of would use with mapGroupsWithState.
    *
    * `tieCol` breaks ordering ties deterministically when multiple right
    * rows share a timestamp (the last one in tie order wins, like
    * merge_asof on a stably-sorted frame).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   timeCol: String, valueCols: Seq[String],
                   tieCol: Option[String] = None): DataFrame = {
    // a requested tie-break column that right doesn't carry is a caller
    // bug — silently dropping it would make results nondeterministic
    // exactly when the tie-break matters (multiple right rows per ts)
    tieCol.foreach(c => require(right.columns.contains(c),
      s"tieCol '$c' not in right columns ${right.columns.mkString("[", ",", "]")}"))
    val l = left.withColumn("__side", lit(0))
    // right contributes keys + time + ONE STRUCT of the carried values
    // (+ its tie column). The struct is the row-atomicity fix: filling
    // each value column independently with ignoreNulls would source a
    // null-valued column from an OLDER right row than the matched one —
    // the struct is non-null for every right row, so the fill carries
    // the nearest row whole and a null value stays null (pandas
    // merge_asof semantics).
    val rTie = tieCol.map(c => col(c).as("__tie")).toSeq
    val r = right.select(
        (keys :+ timeCol).map(col) ++
          Seq(struct(valueCols.map(col): _*).as("__rrow")) ++ rTie: _*)
      .withColumn("__side", lit(1))
    val unified = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time (side desc), so the
    // <= bound is inclusive; __tie only orders ties AMONG right rows
    val order: Seq[Column] =
      Seq(col(timeCol).asc, col("__side").desc) ++
        rTie.map(_ => col("__tie").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unified.withColumn("__fill",
      last(col("__rrow"), ignoreNulls = true).over(w))
    valueCols.foldLeft(filled.filter(col("__side") === 0)) { (df, c) =>
        df.withColumn(s"asof_$c", col("__fill").getField(c))
      }
      .drop("__side", "__tie", "__rrow", "__fill")
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`): for
    * every left row, attach `valueCols` from the EARLIEST right row with
    * `right.timeCol >= left.timeCol`. The exact mirror of
    * [[asofBackward]] — time-descending scan, right rows still sorting
    * before left at equal time (the >= bound is inclusive); among
    * equal-time right rows the FIRST in `tieCol` order wins (the mirror
    * of backward's last-wins). Same one-shuffle shape.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, valueCols: Seq[String],
                  tieCol: Option[String] = None): DataFrame = {
    tieCol.foreach(c => require(right.columns.contains(c),
      s"tieCol '$c' not in right columns ${right.columns.mkString("[", ",", "]")}"))
    val l = left.withColumn("__side", lit(0))
    val rTie = tieCol.map(c => col(c).as("__tie")).toSeq
    // struct carry for row atomicity — see [[asofBackward]]
    val r = right.select(
        (keys :+ timeCol).map(col) ++
          Seq(struct(valueCols.map(col): _*).as("__rrow")) ++ rTie: _*)
      .withColumn("__side", lit(1))
    val unified = l.unionByName(r, allowMissingColumns = true)
    val order: Seq[Column] =
      Seq(col(timeCol).desc, col("__side").desc) ++
        rTie.map(_ => col("__tie").desc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unified.withColumn("__fill",
      last(col("__rrow"), ignoreNulls = true).over(w))
    valueCols.foldLeft(filled.filter(col("__side") === 0)) { (df, c) =>
        df.withColumn(s"asof_$c", col("__fill").getField(c))
      }
      .drop("__side", "__tie", "__rrow", "__fill")
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): the
    * closer of the backward and forward matches by absolute time
    * distance; equal distance breaks BACKWARD (documented engine
    * policy; distance 0 — an exact-time right row — therefore always
    * resolves backward, with backward's arg-max tie pick).
    *
    * ONE union, ONE key shuffle, ONE sort: the backward candidate is a
    * running `last(ignoreNulls)` frame and the forward candidate the
    * mirrored `first(ignoreNulls)` over [current, unbounded following]
    * — both frames share the same window spec, so Catalyst computes
    * them in a single Window pass (two chained directional scans would
    * shuffle twice; the union between them breaks co-partitioning).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  timeCol: String, valueCols: Seq[String],
                  tieCol: Option[String] = None): DataFrame = {
    tieCol.foreach(c => require(right.columns.contains(c),
      s"tieCol '$c' not in right columns ${right.columns.mkString("[", ",", "]")}"))
    require(!valueCols.contains("__rt"), "valueCols may not use the reserved name __rt")
    val l = left.withColumn("__side", lit(0))
    val rTie = tieCol.map(c => col(c).as("__tie")).toSeq
    // one struct per right row carries (time + values) ATOMICALLY: the
    // candidate's time and its values always come from the same row, so
    // a null-valued nearest row yields a null result (pandas semantics),
    // never a farther row's value paired with the nearer row's distance
    val r = right.select(
        (keys :+ timeCol).map(col) ++
          Seq(struct(col(timeCol).as("__rt") +: valueCols.map(col): _*).as("__rrow")) ++
          rTie: _*)
      .withColumn("__side", lit(1))
    val unified = l.unionByName(r, allowMissingColumns = true)
    val order: Seq[Column] =
      Seq(col(timeCol).asc, col("__side").desc) ++
        rTie.map(_ => col("__tie").asc_nulls_first)
    val part = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val wB = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unified
      .withColumn("__b", last(col("__rrow"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__rrow"), ignoreNulls = true).over(wF))
    val bt = col("__b").getField("__rt"); val ft = col("__f").getField("__rt")
    // backward wins when forward is missing or strictly farther
    val pickBackward = ft.isNull ||
      (bt.isNotNull && (col(timeCol) - bt) <= (ft - col(timeCol)))
    val picked = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(pickBackward, col("__b").getField(c)).otherwise(col("__f").getField(c)))
    }
    picked.filter(col("__side") === 0)
      .drop("__side", "__tie", "__rrow", "__b", "__f")
  }

  /** Point-in-interval (range) join: rows of `points` whose `pointCol`
    * (long) falls in [startCol, endCol) of `intervals`. Bucketing turns
    * the inequality join into an equi-join: each interval explodes to the
    * buckets it covers, each point maps to exactly one bucket, the
    * equi-join on bucket prunes candidates to O(selectivity), and the
    * precise range predicate filters the remainder.
    *
    * `bucketSize` trades explode fan-out (long intervals → many buckets)
    * against candidate precision; pick ≈ the median interval length.
    * Without this, Spark plans an inequality join as
    * BroadcastNestedLoopJoin — O(|L|·|R|) — which is the non-scalable
    * thing this operator exists to avoid.
    */
  def pointInIntervalJoin(points: DataFrame, pointCol: String,
                          intervals: DataFrame, startCol: String, endCol: String,
                          bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketSize).cast("long"),
        floor((col(endCol) - 1) / bucketSize).cast("long"))))
    val pt = points.withColumn("__bucket", floor(col(pointCol) / bucketSize).cast("long"))
    pt.join(iv, "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
