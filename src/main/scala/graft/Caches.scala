package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted intermediates.
  *
  * Several operators (the classed dedup miners, [[operators.GroupOps.denseId]])
  * `persist()` a mid-plan table because it feeds 3–5 plan branches; the
  * cache must live until the RETURNED DataFrame is materialized, so the
  * operator itself can never safely unpersist. Without cleanup, a
  * long-lived session running the dedup family accumulates cached class
  * tables until memory-pressure eviction.
  *
  * Contract: operators register every internal `persist()` via [[track]];
  * callers invoke [[unpersistAll]] after materializing the result (Bench
  * and Verify do, once per query). Idempotent and cheap when empty.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an operator-internal persisted DataFrame; returns it. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked intermediate (non-blocking) and clear the
    * registry. Safe to call at any point after the consuming query's
    * action completes.
    */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }
}
