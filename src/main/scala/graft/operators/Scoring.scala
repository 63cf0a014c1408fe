package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-relative text relevance scoring (TF-IDF / BM25) — the ranking
  * primitive behind corpus search, quality-weighted sampling, and
  * query-targeted subset extraction in a training-data pipeline. No
  * reference implementation (SURVEY.md §7.4 LLM-pipeline category);
  * semantics are the standard Robertson/Sparck-Jones BM25 with the
  * Lucene-style non-negative idf: ln(1 + (N - n_t + 0.5) / (n_t + 0.5)).
  *
  * Scale shape (the 100 TB contract):
  *  - one explode over the corpus with the doc length RIDING ALONG on
  *    each token row, immediately filtered to the query terms — the
  *    shuffled tf table is |matching docs| × |query terms| rows and no
  *    corpus-keyed join exists anywhere (an earlier formulation joined
  *    tf against a corpus-wide doc-length table — a corpus-sized
  *    shuffle for two longs a map-side column already knew);
  *  - document-frequency and corpus stats (N, avgdl) are tiny aggregates
  *    (≤ |query terms| rows / 1 row) joined back by explicit broadcast —
  *    no corpus-sized build side anywhere.
  *
  * Tokenization IS [[graft.functions.TextFunctions.tokens]] (lower +
  * trim + whitespace split) — the one canonical tokenizer, so scores
  * line up with the text stats the pipeline already computes by
  * construction.
  */
object Scoring {

  /** Per-document BM25 score against a bag of query terms.
    * Output: (id, n_matched, score) — one row per document containing at
    * least one query term.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val docs = df.select(col(idCol),
      graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))

    // 1-row corpus stats (N, avgdl — over ALL docs, matching or not);
    // broadcast into the score projection
    val stats = docs
      .select(size(col("__toks")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n_docs"), avg(col("__dl")).as("__avgdl"))

    // (id, dl, term, tf) for query terms only — dl rides along on the
    // token rows, and the explode's output is cut down BEFORE any shuffle
    val tf = docs
      .select(col(idCol), size(col("__toks")).cast("long").as("__dl"),
        explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))

    // (term, n_t): in how many docs each query term appears — ≤ |terms| rows
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__nt"))

    val idf = log(lit(1.0) +
      (col("__n_docs") - col("__nt") + lit(0.5)) / (col("__nt") + lit(0.5)))
    val tfNorm = col("__tf") * (lit(k1) + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))

    tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", idf * tfNorm)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched"), sum(col("__contrib")).as("score"))
  }

  /** Corpus vocabulary induction: one row per distinct token with its
    * collection frequency (`tf`, total occurrences) and document
    * frequency (`df`, docs containing it) — the input to tokenizer
    * vocabulary construction, stop-word discovery, and idf tables.
    * Empty tokens (empty/whitespace-only docs) are excluded.
    *
    * Scale shape: one explode + one hash aggregate keyed on token —
    * partial (map-side) aggregation shrinks the shuffle to vocabulary
    * size, not corpus size. Exact `count(DISTINCT id)` plans a two-phase
    * Expand aggregate; at 100 TB pass `exactDf = false` for the
    * single-pass HLL sketch (±rsd, default 5%) when df feeds a
    * threshold, not an oracle.
    */
  def vocabTable(df: DataFrame, idCol: String, textCol: String,
                 exactDf: Boolean = true): DataFrame = {
    val tok = df.select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    tok.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        (if (exactDf) countDistinct(col("__id"))
         else approx_count_distinct(col("__id"))).as("df"))
  }

  /** Per-(doc, term) TF-IDF weights over the WHOLE vocabulary — the
    * feature-extraction form (ln-smoothed idf = ln(N / n_t)). Unlike
    * [[bm25]] the df table here is vocabulary-sized, so it is joined by
    * shuffle, not broadcast (a 100 TB corpus's vocabulary is itself
    * large); the join key (term) is the aggregation key, so the exchange
    * is reused between the df agg and the join.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(col(idCol),
      graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val terms = docs
      .select(col(idCol), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("__nt"))
    terms.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"),
        (col("tf") * log(col("__n_docs").cast("double") / col("__nt"))).as("tf_idf"))
  }
}
