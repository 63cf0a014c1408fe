package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al.,
  * NeurIPS 2023): score every raw-corpus document by how much more
  * likely its hashed n-gram bag is under a TARGET corpus's unigram+
  * bigram model than under the raw corpus's own —
  * `w(x) = Σ_b c_x[b] · (ln p̂_target[b] − ln q̂_raw[b])` — then keep
  * the highest-weight documents to shift a 100 TB crawl toward a
  * curated distribution (the paper's recipe for pretraining-data
  * selection). No reference analog (the pandas ETL has no data-
  * selection surface, SURVEY.md §2.12); semantics from the paper's
  * hashed-ngram variant.
  *
  * Feature hashing makes both models FIXED-SIZE: grams land in
  * `buckets` cells via the engine's md5-prefix hash (the q25
  * engine-portable convention — DuckDB can rebuild the exact bucket
  * with `CAST('0x' || substring(md5(g),1,8) AS BIGINT)`), so each
  * model is a ≤`buckets`-row table regardless of corpus size, with
  * Laplace smoothing `(c_b + α) / (N + α·B)` keeping unseen buckets
  * finite.
  *
  * Scale shape (100 TB contract): gram generation is map-side
  * (unigrams + a zip-with-own-tail bigram list — no token self-join);
  * both model fits collapse to `buckets` rows via partial aggregation;
  * scoring joins the doc×bucket table against the two BROADCAST
  * bucket models and reduces keyed on doc id — the corpus shuffles
  * once (doc-id-keyed score reduce) and nothing corpus-sized reaches
  * the driver. The two totals ride along as 1-row broadcast frames
  * (the [[Scoring.pmiCollocations]] pattern).
  */
object Dsir {

  /** Lowercased single-space tokens with empties dropped (exactly the
    * DuckDB `list_filter(string_split(lower(trim(t)), ' '), ...)`
    * shape so the oracle reproduces byte-identical grams).
    */
  private def cleanToks(text: org.apache.spark.sql.Column) =
    filter(split(lower(trim(text)), " "), t => t =!= lit(""))

  /** Hashed unigram+bigram bucket counts per document: (id, b, c).
    * Documents with zero tokens produce no rows (no grams → no
    * evidence → no score), documented contract.
    */
  private[operators] def gramBuckets(docs: DataFrame, idCol: String,
                                     textCol: String, buckets: Int): DataFrame = {
    val tk = cleanToks(col(textCol))
    val grams = docs
      .select(col(idCol).as("id"), tk.as("__tk"))
      .select(col("id"), explode(concat(
        col("__tk"),
        zip_with(
          slice(col("__tk"), lit(1), greatest(size(col("__tk")) - 1, lit(0))),
          slice(col("__tk"), lit(2), greatest(size(col("__tk")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))).as("g"))
    grams
      .select(col("id"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets).as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Per-raw-document DSIR importance weight against a target corpus.
    *
    * Output: (id, n_grams, weight) — one row per raw document with at
    * least one token; `weight` is the exact log-ratio sum (callers
    * round for presentation; rank or threshold on it to select).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 1024,
                        alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0.0, s"alpha must be positive (Laplace smoothing), got $alpha")
    val docB = gramBuckets(raw, idCol, textCol, buckets)
    // model fits: bucket counts + 1-row totals, both bounded by `buckets`
    val tCnt = gramBuckets(target, idCol, textCol, buckets)
      .groupBy("b").agg(sum("c").as("__ct"))
    val rCnt = docB.groupBy("b").agg(sum("c").as("__cr"))
    val tTot = tCnt.agg(coalesce(sum("__ct"), lit(0L)).cast("double").as("__nt"))
    val rTot = rCnt.agg(coalesce(sum("__cr"), lit(0L)).cast("double").as("__nr"))
    val aB = alpha * buckets
    docB
      .join(broadcast(tCnt), Seq("b"), "left")
      .join(broadcast(rCnt), Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("__w", col("c") *
        (log((coalesce(col("__ct"), lit(0L)) + alpha) / (col("__nt") + aB)) -
         log((coalesce(col("__cr"), lit(0L)) + alpha) / (col("__nr") + aB))))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_grams"), sum(col("__w")).as("weight"))
  }
}
