package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangRoutingSpec extends SparkSpec {

  import spark.implicits._

  // the LangNbSpec planted corpus: enough char-3-gram mass to separate
  // en/es with wide margins
  private val trainRows: Seq[(String, String)] = Seq(
    "the cat sat on the mat and looked at the dog" -> "en",
    "a quick brown fox jumps over the lazy dog" -> "en",
    "she sells sea shells by the sea shore every morning" -> "en",
    "el rápido zorro marrón salta sobre el perro perezoso" -> "es",
    "la señora compró naranjas y limones en el mercado pequeño" -> "es",
    "los niños juegan en el jardín durante la mañana soleada" -> "es")

  private lazy val trainDf = trainRows.toDF("text", "lang")
  private lazy val model = LangNb.fit(trainDf, "text", "lang", n = 3, buckets = 512)

  // 50+ words (the Gopher word-count floor) by repeating the language
  // sentence itself — filler gibberish would swamp the gram signal
  private def longText(sentence: String, reps: Int): String =
    Seq.fill(reps)(sentence).mkString(" ")
  private val enDoc =
    longText("the cat sat on the mat and looked at the dog", 6)
  private val esDoc =
    longText("el rápido zorro marrón salta sobre el perro perezoso", 7)
  private val enDoc2 =
    longText("she sells sea shells by the sea shore every morning", 6)

  test("routing: high-margin docs face their language's rules, low-margin quarantine") {
    val docs = Seq(
      (1L, enDoc),
      (2L, esDoc),
      (3L, "xqz9 kv7") // no trained grams either way → near-tie, small margin
    ).toDF("doc_id", "text")
    val routed = LangRouting.routedRules(docs, "doc_id", "text", model,
      tauQ = 5000000L)
    val byId = routed.select("doc_id", "route", "keep_routed", "r_stopwords", "margin_q")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(byId(1L)._1 == "en" && byId(2L)._1 == "es",
      s"clear docs route to their language: $byId")
    assert(byId(3L)._1 == LangRouting.QuarantineRoute,
      s"a no-evidence doc must quarantine: ${byId(3L)}")
    assert(!byId(3L)._2, "quarantine never keeps")
    // doc 1 carries ≥2 Gopher stopwords → the en route runs all 12
    // rules and keeps; doc 2's es text has 0 English stopwords, so the
    // stopword rule FAILS — but the es route doesn't consult it
    assert(byId(1L)._3 && byId(1L)._2, s"en doc keeps under the full ruleset: ${byId(1L)}")
    assert(!byId(2L)._3, "the English stopword rule fires on the es doc")
    assert(byId(2L)._2,
      "the es route must keep anyway — the stopword rule is en-only (the routing point)")
  }

  test("tau sweep: tau=0 routes everything, tau=MaxValue quarantines everything") {
    val docs = Seq((1L, enDoc), (2L, esDoc)).toDF("doc_id", "text")
    val all = LangRouting.routedRules(docs, "doc_id", "text", model, tauQ = 0L)
    assert(all.filter(col("route") === LangRouting.QuarantineRoute).count() == 0)
    val none = LangRouting.routedRules(docs, "doc_id", "text", model,
      tauQ = Long.MaxValue)
    assert(none.filter(col("route") =!= LangRouting.QuarantineRoute).count() == 0)
    assert(none.filter(col("keep_routed")).count() == 0)
  }

  test("routedFunnel: one map-side pass (no shuffle below the rollup), exact margin mass") {
    val docs = Seq((1L, enDoc), (2L, esDoc), (3L, enDoc2)).toDF("doc_id", "text")
    val funnel = LangRouting.routedFunnel(docs, "doc_id", "text", model, tauQ = 5000000L)
    // the only exchange may be the rollup's own aggregate shuffle
    val plan = funnel.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"route+rules must stay map-side; only the final aggregate may shuffle:\n$plan")
    val rows = funnel.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val margins = LangRouting.routedRules(docs, "doc_id", "text", model, tauQ = 5000000L)
      .select("route", "margin_q").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    rows.foreach { case (route, (_, _, sumM)) =>
      assert(sumM == margins(route), s"margin mass for $route must be the exact long sum")
    }
    assert(rows("en")._1 == 2 && rows("es")._1 == 1)
  }
}
