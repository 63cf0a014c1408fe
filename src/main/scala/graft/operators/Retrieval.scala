package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation for retrieval pipelines: the metrics a
  * search/RAG stack runs after every index or model change — P@k,
  * R@k, MRR, and graded nDCG@k — computed distributed over (results,
  * judgments) tables. Everything is two bounded joins and one window
  * over the JUDGMENT set (results are nQueries·k rows, judgments are
  * the labeled pairs): at 100 TB the corpus never appears here, only
  * its evaluated slice.
  *
  * Conventions (TREC-standard): ranks are 1-based; a document is
  * relevant when its grade > 0; DCG uses the graded gain
  * (2^grade − 1)/log2(rank + 1); IDCG ranks the query's judged grades
  * descending (ties by doc id) and takes the top k, so nDCG = 1 iff
  * the retrieved order is an ideal order. Queries with no judged
  * relevant documents get recall/mrr/ndcg = 0, not null/NaN.
  */
object Retrieval {

  /** Per-query metrics table.
    *
    * @param results   `(queryCol, docCol, rankCol)` — ≤ k rows per
    *                  query, rank 1-based (rows with rank > k are
    *                  ignored, so a k'-deep result table evaluates at
    *                  any k ≤ k')
    * @param judgments `(queryCol, docCol, gradeCol)` — graded
    *                  relevance; unjudged retrieved docs count as
    *                  grade 0
    */
  def rankingMetrics(results: DataFrame, judgments: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     gradeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val res = results
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("int").as("__r"))
      .filter(col("__r") <= k)
    val jud = judgments.select(col(queryCol).as("__q"), col(docCol).as("__d"),
      col(gradeCol).cast("double").as("__g"))

    val gain = (pow(lit(2.0), col("__g")) - 1) / log2(col("__r") + 1)
    val perQuery = res.join(jud, Seq("__q", "__d"), "left")
      .na.fill(0.0, Seq("__g"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("__g") > 0, 1L).otherwise(0L)).as("n_relevant_retrieved"),
        sum(gain).as("dcg"),
        max(when(col("__g") > 0, lit(1.0) / col("__r")).otherwise(0.0)).as("mrr"))

    val relevant = jud.filter(col("__g") > 0)
    val totals = relevant.groupBy(col("__q"))
      .agg(count(lit(1)).as("n_relevant_total"))
    val ideal = relevant
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__q")).orderBy(col("__g").desc, col("__d").asc)))
      .filter(col("__r") <= k)
      .groupBy(col("__q")).agg(sum(gain).as("idcg"))

    perQuery
      .join(totals, Seq("__q"), "left")
      .join(ideal, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        col("n_retrieved"),
        coalesce(col("n_relevant_total"), lit(0L)).as("n_relevant_total"),
        col("n_relevant_retrieved"),
        (col("n_relevant_retrieved") / k.toDouble).as("precision_k"),
        when(col("n_relevant_total").isNull, 0.0)
          .otherwise(col("n_relevant_retrieved") / col("n_relevant_total"))
          .as("recall_k"),
        col("mrr"),
        when(col("idcg").isNull, 0.0)
          .otherwise(col("dcg") / col("idcg")).as("ndcg"))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * merge N ranked runs — lexical, vector, any backend — into one
    * list by `score(d) = Σ_runs 1/(k + rank_run(d))`, the standard
    * hybrid-search combiner (k = 60 per the paper; rank-based, so no
    * cross-run score calibration is needed, which is exactly why it
    * beats score averaging across heterogeneous retrievers). A doc
    * absent from a run simply contributes nothing from it; `n_runs`
    * reports how many runs surfaced each doc. Fused ranks re-densify
    * 1..topN per query, ties breaking by doc id.
    *
    * Scale shape: runs are nQueries·depth rows (evaluation-sized) —
    * one keyed aggregation + one per-query window over ≤ Σ depths
    * rows; the corpus stays inside the retrievers.
    */
  def rrfFusion(runs: Seq[DataFrame], queryCol: String, docCol: String,
                rankCol: String, k: Int = 60, topN: Int = 10): DataFrame = {
    require(runs.nonEmpty, "rrfFusion needs at least one run")
    require(k >= 0, s"k must be >= 0, got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val contribs = runs.map(_.select(col(queryCol), col(docCol),
        (lit(1.0) / (lit(k) + col(rankCol).cast("double"))).as("__c")))
      .reduce(_ unionByName _)
    contribs
      .groupBy(col(queryCol), col(docCol))
      .agg(sum(col("__c")).as("rrf_score"), count(lit(1)).as("n_runs"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_score").desc, col(docCol).asc)))
      .filter(col("fused_rank") <= topN)
  }

  /** Hard-negative mining for contrastive retrieval training (the DPR /
    * ANCE recipe — Karpukhin et al. 2020, Xiong et al. 2021): for each
    * query, take its top-ranked retrieved candidates, remove the judged
    * positives, and keep the first `n` that remain — the
    * "looks-relevant-but-isn't" examples a bi-encoder needs, mined from
    * the retriever's own confusions rather than sampled at random.
    *
    * Composable over ANY retrieval backend: `results` is a ranked
    * candidate table (from brute-force, LSH, IVF, or PQ search),
    * `positives` the (query, doc) pairs to exclude. Negative ranks are
    * re-densified (1..n) after exclusion so downstream samplers can
    * stratify on them; all other `results` columns (scores, metadata)
    * pass through. A query whose candidate list is entirely positive
    * yields fewer than `n` rows — mine deeper, don't pad.
    *
    * Scale shape: results are nQueries·depth rows — evaluation-sized,
    * never corpus-sized; one keyed anti-join + one per-query window
    * over ≤ depth rows. The expensive part (candidate generation)
    * stays in the ANN family where its scale story already lives.
    */
  def hardNegatives(results: DataFrame, positives: DataFrame,
                    queryCol: String, docCol: String, rankCol: String,
                    n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val pos = positives.select(col(queryCol), col(docCol)).distinct()
    results.join(pos, Seq(queryCol, docCol), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col(queryCol)).orderBy(col(rankCol).asc)))
      .filter(col("neg_rank") <= n)
      .drop(rankCol)
  }
}
