package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style merge: fold a changelog into a snapshot with latest-wins
  * semantics — the engine-side primitive behind "MERGE INTO" / upsert
  * table maintenance that every incremental pipeline needs (the
  * reference re-runs full overwrites weekly; at 100 TB a full rewrite
  * per update batch is not an option). No reference implementation
  * (SURVEY.md §7.4 category).
  *
  * Plan shape: ONE wide union (no data movement — both inputs must just
  * be unionByName-compatible) followed by ONE hash shuffle on the key
  * and a per-key window top-1. Deterministic: version ties break on
  * `tieBreak` descending, so the same inputs give the same snapshot on
  * any cluster (dropDuplicates would not). At scale the shuffle is the
  * unavoidable cost of key-wise reconciliation; bucketed storage on the
  * key (see [[graft.sources.Tables]] bucketed writes) turns it into a
  * shuffle-free sort-merge.
  */
object Merge {

  /** Latest row per key across snapshot ∪ changelog. */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             versionCol: String, tieBreak: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val unioned = base.unionByName(changes)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col(tieBreak).desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[upsert]] plus delete semantics: a key whose LATEST change carries
    * `opCol == deleteOp` disappears from the merged snapshot (tombstone
    * handling — the part naive "union + distinct" merges get wrong: a
    * delete must also suppress the OLD base row, which filtering before
    * the merge would not).
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keys: Seq[String],
                     versionCol: String, tieBreak: String,
                     opCol: String, deleteOp: String): DataFrame =
    upsert(base, changes, keys, versionCol, tieBreak)
      .filter(col(opCol) =!= deleteOp)

  /** Row-level diff of two snapshots of the same keyed table: every key
    * classified `added` / `removed` / `changed` / `unchanged`, with the
    * tracked attributes from both sides (`old_*` / `new_*`) so the
    * caller can render or act on the delta — the audit primitive behind
    * "what did this pipeline run change" and incremental-publish
    * decisions (ship only `added ∪ changed`).
    *
    * Change detection is null-safe (`<=>`): null → null is unchanged,
    * null → value is changed. Presence is tracked with an explicit
    * marker column, NOT the nullability of attributes, so an all-null
    * row on one side still classifies correctly.
    *
    * Plan shape: one full-outer sort-merge join on the key — each side
    * shuffles once, the classification is a map-side projection over the
    * joined row. At 100 TB both snapshots bucketed on the key (see
    * [[graft.sources.Tables]]) make it shuffle-free; there is no
    * driver-side state and no window.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(tracked.nonEmpty, "need at least one tracked column")
    require(keys.intersect(tracked).isEmpty,
      s"key and tracked columns must be disjoint: ${keys.intersect(tracked)}")
    val produced = tracked.flatMap(c => Seq(s"old_$c", s"new_$c")) :+ "change_type"
    val clashing = produced.intersect(keys ++ tracked)
    require(clashing.isEmpty,
      s"input columns collide with produced diff columns: $clashing")
    val o = oldDf.select(keys.map(col) ++
      tracked.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__in_old"): _*)
    val n = newDf.select(keys.map(col) ++
      tracked.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__in_new"): _*)
    val anyChanged = tracked
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__in_old", "__in_new")
  }

  /** SCD type-2 history from a changelog: one validity interval per
    * ACTUAL attribute change. Consecutive changes with identical tracked
    * attributes collapse into one version (the no-op-change suppression
    * that separates SCD2 from a raw event log); `valid_from` = the change
    * timestamp, `valid_to` = the next version's timestamp (null while
    * current), plus an `is_current` flag.
    *
    * Determinism: same-timestamp changes order by `tieBreak` ascending —
    * the LAST of a timestamp tie wins the interval, earlier ties become
    * zero-length versions (kept: auditability beats silent drops; filter
    * `valid_from <> valid_to` downstream if zero-length versions are
    * unwanted).
    *
    * Plan shape: one shuffle on the key; both windows (change detection
    * lag, interval-close lead) share the same partitioning/ordering, so
    * Catalyst plans a single Exchange + two Window passes over sorted
    * runs. At 100 TB the changelog shuffles once — there is no
    * snapshot-sized join, and no per-version state beyond the sort.
    */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           tieBreak: String, tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty, "need key and tracked columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    // a row opens a new version iff any tracked attribute differs from
    // the previous change of the same key (null-safe: <=> treats
    // null==null as unchanged) or it is the key's first change
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val versions = changes
      .withColumn("__first", lag(col(tsCol), 1).over(w).isNull)
      .withColumn("__open", col("__first") || changed)
      .filter(col("__open"))
      .drop("__first", "__open")
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
