package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a (small) delta batch into a
  * previously materialized aggregate WITHOUT rescanning history — the
  * pattern that turns an O(100 TB) nightly recompute into an O(delta)
  * update. Works for any decomposable aggregate kept in partial form:
  * sum and count are merged by +, min/max by min/max; avg is DERIVED
  * from (sum, count) at read time — never stored, because stored
  * averages don't merge.
  *
  * The same algebra is what Spark itself exploits for partial/final
  * aggregation inside one query (SURVEY §4.2); this operator applies it
  * ACROSS materializations. Companion to [[Merge.applyChangelog]]
  * (latest-wins row merge): applyChangelog maintains a TABLE
  * incrementally, mergeAdditive maintains an AGGREGATE incrementally.
  * Retractions (rows leaving history) need signed deltas: feed the
  * retracted rows with negated measures — sums/counts stay exact;
  * min/max can only widen (the known limitation of additive-only
  * maintenance; exact min/max under deletes needs a rescan or an index).
  *
  * Scale shape: the union's aggregation shuffles |snapshot keys| +
  * |delta| rows, hash-partitioned by the group keys; the snapshot side
  * is ALREADY one row per key, so the combine is near-map-side.
  */
object Incremental {

  /** Partial-form aggregate of `df`: per key, (sum, count, min, max) for
    * every measure in `measures` — the state this module maintains.
    * Column layout: `<m>_sum, <m>_cnt, <m>_min, <m>_max` per measure.
    */
  def partialAgg(df: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.flatMap(m => Seq(
          sum(col(m)).as(s"${m}_sum"),
          count(col(m)).as(s"${m}_cnt"),
          min(col(m)).as(s"${m}_min"),
          max(col(m)).as(s"${m}_max"))): _*)

  /** Merge two partial-form aggregates (same schema) into one: the
    * monoid append. Keys present in either side survive; measures
    * combine by the decomposition (+, +, min, max).
    */
  def mergeAdditive(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                    measures: Seq[String]): DataFrame =
    snapshot.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        measures.flatMap(m => Seq(
          sum(col(s"${m}_sum")).as(s"${m}_sum"),
          sum(col(s"${m}_cnt")).as(s"${m}_cnt"),
          min(col(s"${m}_min")).as(s"${m}_min"),
          max(col(s"${m}_max")).as(s"${m}_max"))): _*)

  /** Read-time finalization: derive avg from the partial columns. */
  def withAvg(agg: DataFrame, measures: Seq[String]): DataFrame =
    measures.foldLeft(agg) { (df, m) =>
      df.withColumn(s"${m}_avg",
        col(s"${m}_sum").cast("double") / col(s"${m}_cnt"))
    }

  /** Incremental JOIN maintenance under append-only inputs: the NEW
    * rows of (A ∪ ΔA) ⋈ (B ∪ ΔB) beyond the already-materialized
    * A ⋈ B are exactly ΔA ⋈ B ∪ ΔA ⋈ ΔB ∪ A ⋈ ΔB — so a
    * materialized join view updates by joining only the deltas against
    * the opposite snapshots, never rescanning A ⋈ B. At 100 TB this is
    * the difference between touching a day's partition and recomputing
    * a year: cost is |Δ|-proportional on each side (the snapshot side
    * of each term shuffles once on the join keys — or not at all if
    * both sides are bucketed on them, the layout this engine's
    * writeBucketed exists for).
    * Output: the delta join rows (same schema as the full join).
    */
  def joinDelta(oldA: DataFrame, deltaA: DataFrame,
                oldB: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame =
    deltaA.join(oldB.unionByName(deltaB), keys)
      .unionByName(oldA.join(deltaB, keys))

  /** Incremental exact-dedup admission: the rows of a NEW batch whose
    * content fingerprint is absent from the already-curated `index`,
    * deduplicated within the batch itself by minimum id (the
    * [[Dedup.exactDedupGroups]] keep rule). This is what lets a crawl
    * pipeline curate batch N against N−1 batches of history WITHOUT
    * recomputing the corpus: admitted = dedupDelta(batch, index);
    * index' = index ∪ admitted fingerprints. As long as batches arrive
    * in id order (a crawl's ids are arrival-ordered by construction),
    * fold-left admission is EXTENSIONALLY EQUAL to a cold recompute's
    * min-id dedup over the union — the q249 oracle pins that identity.
    *
    * Scale shape: one fingerprint-keyed anti-join (|batch| + one probe
    * of the index — keep the persisted index BUCKETED on the
    * fingerprint, the [[graft.sources.Tables]] bucketed-layout
    * convention, and the index side shuffles zero bytes) plus one
    * |batch|-sized min aggregate. Cost is O(delta), never O(corpus).
    */
  def dedupDelta(batch: DataFrame, index: DataFrame,
                 idCol: String, fpCol: String): DataFrame = {
    val fresh = batch.join(index.select(col(fpCol)), Seq(fpCol), "left_anti")
    val winners = fresh.groupBy(col(fpCol)).agg(min(col(idCol)).as(idCol))
    fresh.join(winners, Seq(fpCol, idCol), "left_semi")
  }
}
