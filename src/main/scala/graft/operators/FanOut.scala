package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out before row-proportional map kernels
  * (guide-§2 shape: parallelism should come from the data layout, and
  * when it doesn't — the single-file, single-row-group bench corpus
  * arrives as ONE scan split — buy it with one narrow shuffle).
  *
  * A CPU-bound per-row kernel (Viterbi tokenization, char-gram
  * scoring, per-word lattice sums) downstream of a 1-split scan runs
  * on one core no matter how many the session has; repartitioning the
  * narrow input costs one shuffle of the rows themselves (bytes ≈
  * input size, trivially small exactly when the split count is the
  * problem) and unlocks full parallelism. Inputs that already arrive
  * with at least the session's shuffle parallelism — any real
  * at-scale layout — pass through UNTOUCHED, so nothing here is tuned
  * to local mode: the shuffle exists only where the layout starves
  * the cores.
  *
  * Contract: call on SCAN-ROOTED plans (reads + projections/filters
  * only). Probing the partition count materializes the RDD lineage,
  * which under AQE would eagerly run any upstream shuffle stages.
  * The explicit partition count is deliberately NOT the bare
  * `repartition()` — a user-specified count is exempt from AQE
  * coalescing, which would otherwise fold the tiny bench corpus right
  * back into one partition.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
