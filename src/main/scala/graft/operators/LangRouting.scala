package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-language ROUTED curation — the composition the q253 routing
  * audit exists for: the trained classifier's confidence margin
  * ([[LangNb.predictMargins]]) decides which language's quality-rule
  * thresholds a document faces, because quality heuristics carry
  * language priors — q239's own table shows the Gopher stopword rule
  * (an ENGLISH word list) passing 0/500 on a non-English-prior corpus.
  * Running one global ruleset over a multilingual crawl silently
  * zeroes whole languages; routing first is what a real multilingual
  * pipeline does (the CCNet/RedPajama per-language pipeline shape).
  *
  * Routing contract:
  *   - margin_q ≥ tauQ (exact integer micro-log units, the q253
  *     scale) → route = pred_lang: the document faces its language's
  *     thresholds — here, the stopword rule is active ONLY for
  *     `stopwordLang` (the language its word list was built for);
  *     every other language route runs the 11 language-neutral rules.
  *   - margin_q < tauQ → route = "quarantine": too ambiguous to
  *     commit to any language's thresholds; held for review, never
  *     silently kept (keep_routed = false by definition).
  *
  * Scale shape: ONE map-side pass — [[LangNb.predictMargins]] is a
  * broadcast-model projection and [[QualityRules.ruleTable]] carries
  * its columns through (carryCols), so route + rules compose with the
  * scan with no join and no shuffle; a 100 TB corpus routes in the
  * same single pass that scores it.
  */
object LangRouting {

  val QuarantineRoute = "quarantine"

  /** Per-document routed rule table: the [[QualityRules.ruleTable]]
    * columns plus `pred_lang`, `margin_q`, `route`, and `keep_routed`
    * (the route's own ruleset verdict; quarantine never keeps).
    */
  def routedRules(df: DataFrame, idCol: String, textCol: String,
                  model: LangNb.Model, tauQ: Long,
                  stopwordLang: String = "en",
                  stopwords: Seq[String] = QualityRules.gopherStopwords): DataFrame = {
    val scored = LangNb.predictMargins(df, textCol, model)
    val rules = QualityRules.ruleTable(scored, idCol, textCol, stopwords,
      carryCols = Seq("pred_lang", "margin_q"))
    val keepSansStopword = QualityRules.ruleNames
      .filterNot(_ == "r_stopwords").map(col).reduce(_ && _)
    rules
      .withColumn("route",
        when(col("margin_q") >= tauQ, col("pred_lang"))
          .otherwise(lit(QuarantineRoute)))
      .withColumn("keep_routed",
        when(col("route") === QuarantineRoute, lit(false))
          .when(col("route") === stopwordLang, col("keep"))
          .otherwise(keepSansStopword))
  }

  /** The per-route funnel rollup a curation run reports: volume,
    * routed keeps, how often the stopword rule WOULD have fired (the
    * signal that routing is what saves non-`stopwordLang` routes), and
    * the exact confidence mass. One hash aggregate over the map-side
    * table — route-count-sized output.
    */
  def routedFunnel(df: DataFrame, idCol: String, textCol: String,
                   model: LangNb.Model, tauQ: Long,
                   stopwordLang: String = "en",
                   stopwords: Seq[String] = QualityRules.gopherStopwords): DataFrame =
    routedRules(df, idCol, textCol, model, tauQ, stopwordLang, stopwords)
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep_routed").cast("long")).as("n_keep"),
        sum((!col("r_stopwords")).cast("long")).as("n_fail_stopwords"),
        sum(col("margin_q")).as("sum_margin_q"))
}
