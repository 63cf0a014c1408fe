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
}
