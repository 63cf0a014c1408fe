package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style per-language perplexity bucketing (Wenzek et al. '20,
  * "CCNet: extracting high-quality monolingual datasets from web
  * crawl data") — the curation stage between language routing and
  * training-set assembly: score every document under a language
  * model, then cut each language's corpus into head / middle / tail
  * perplexity terciles, because a single global threshold is
  * meaningless across languages (each language's perplexity
  * distribution has its own scale — the reason CCNet calibrates per
  * language).
  *
  * This engine's replayable form: the LM score is the exact integer
  * micro-log document likelihood from [[UnigramLm.tokenScores]]
  * (per-language THRESHOLDS carry the per-language calibration; the
  * full CCNet trains one KenLM per language — with a shared tokenizer
  * LM the within-language bucketing is invariant to the scale shift,
  * which is what the terciles need), and the per-token mean negative
  * log-likelihood quantizes to integer MILLI-NATS
  * (`round(-llq / (n_tokens · 1000))`) so the tercile cut runs over a
  * BOUNDED value histogram.
  *
  * Scale shape (the 100 TB design): NO per-language corpus sort. The
  * tercile thresholds come from a (group, nll_milli) count histogram
  * — output bounded by groups × the few-thousand-value milli-nat
  * range, map-side combined — a cumulative window over that bounded
  * table, and a broadcast join back. Scoring and bucketing are
  * map-side; the only corpus shuffle is the histogram's hash
  * aggregate.
  */
object PerplexityBuckets {

  /** Integer milli-nat mean NLL: `round(-llq / (n_tokens*1000))`,
    * half away from zero in both engines. Zero-token docs are the
    * caller's to drop (CCNet drops empties before bucketing).
    */
  def nllMilli(llqCol: String = "llq", nTokensCol: String = "n_tokens") =
    round(-col(llqCol).cast("double") /
      (col(nTokensCol).cast("double") * 1000.0), 0).cast("long")

  /** Per-group head/middle/tail thresholds from the bounded value
    * histogram: t1 = smallest nll value whose cumulative doc count
    * reaches ceil(n/3), t2 likewise at ceil(2n/3). Output: one row
    * per group (groupCol, t1_milli, t2_milli, n_docs_group).
    */
  def tercileThresholds(scored: DataFrame, groupCol: String,
                        nllCol: String = "nll_milli"): DataFrame = {
    val hist = scored.groupBy(col(groupCol), col(nllCol))
      .agg(count(lit(1)).as("__c"))
    // the window runs over the BOUNDED histogram, not the corpus
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(col(groupCol))
        .orderBy(col(nllCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = hist.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__n"))
    val withTot = cum.join(totals, Seq(groupCol))
    // ceil(k·n/3) in exact integer arithmetic — (k·n + 2) div 3 —
    // so the cut is engine-portable with no float boundary hazard
    def cut(k: Int, name: String): DataFrame =
      withTot.filter(col("__cum") >= expr(s"(__n * $k + 2) div 3"))
        .groupBy(col(groupCol)).agg(min(col(nllCol)).as(name))
    cut(1, "t1_milli")
      .join(cut(2, "t2_milli"), Seq(groupCol))
      .join(totals.withColumnRenamed("__n", "n_docs_group"), Seq(groupCol))
  }

  /** Bucket every scored row: `head` (nll ≤ t1 — most fluent),
    * `middle` (≤ t2), `tail` (the rest). Threshold rows broadcast
    * (group-count-sized); assignment is map-side.
    */
  def bucketed(scored: DataFrame, groupCol: String,
               nllCol: String = "nll_milli"): DataFrame = {
    val th = tercileThresholds(scored, groupCol, nllCol)
    scored.join(broadcast(th), Seq(groupCol))
      .withColumn("bucket",
        when(col(nllCol) <= col("t1_milli"), lit("head"))
          .when(col(nllCol) <= col("t2_milli"), lit("middle"))
          .otherwise(lit("tail")))
  }
}
