package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window packing for LLM training: documents' token streams are
  * laid end-to-end and cut into fixed-size bins ("concat-then-split", the
  * standard pretraining batcher — a document whose tokens straddle a cut
  * spans two-plus bins). No reference implementation (SURVEY.md §7.4
  * LLM-pipeline category).
  *
  * The computation is a GLOBAL exact prefix sum of token counts in id
  * order — the naive form is `sum over (Window.orderBy(id))`, a single-
  * partition window that melts the driver at 100 TB (same hazard as W1,
  * SURVEY §2.5). It runs on [[GroupOps.exclusivePrefixSum]] — the same
  * two-phase scan [[GroupOps.denseId]] uses (weight = the token count
  * instead of 1), one shared implementation of the scale-critical
  * machinery.
  */
object Packing {

  /** (id, n_tokens, start_off, bin, bins_spanned): token offsets and bin
    * assignment for budget-`B` packing over documents in ascending
    * `idCol` order. `bin` = B-quotient of the first token's offset;
    * `bins_spanned` counts every bin the document touches.
    */
  def packConcat(df: DataFrame, idCol: String, textCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counted = df.select(col(idCol),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    binned(GroupOps.exclusivePrefixSum(counted, Seq(col(idCol)),
      col("n_tokens"), "start_off"), budget)
  }

  /** Exact long bin arithmetic (`div`, not double `/` — offsets past 2^53
    * must not round) on a frame carrying (n_tokens, start_off).
    */
  private def binned(df: DataFrame, budget: Int): DataFrame =
    df.withColumn("bin", expr(s"start_off div $budget"))
      .withColumn("bins_spanned",
        when(col("n_tokens") === 0, lit(1L)).otherwise(
          expr(s"(start_off + n_tokens - 1) div $budget") - col("bin") + 1))

  /** Grouped form: packing restarts per `groupCol` (per-language /
    * per-source shards). Cheaper than [[packConcat]] — one hash shuffle
    * and an ordinary partitioned window, parallel across groups; the
    * two-phase scan is only needed when the order is global.
    */
  def packByGroup(df: DataFrame, groupCol: String, idCol: String, textCol: String,
                  budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    binned(df.select(col(groupCol), col(idCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L))),
      budget)
  }
}
