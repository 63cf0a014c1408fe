package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerplexityBucketsSpec extends SparkSpec {

  import spark.implicits._

  test("tercile thresholds: exact integer ceil cuts on a known histogram") {
    // 9 docs per group, nll values 1..9 → ceil(9/3)=3 → t1=3,
    // ceil(18/3)=6 → t2=6; with ties at the cut the threshold value
    // absorbs its full tie class
    val a = (1 to 9).map(v => ("a", v.toLong))
    val b = Seq.fill(5)(("b", 10L)) ++ Seq(("b", 20L), ("b", 30L))
    val scored = (a ++ b).toDF("g", "nll_milli")
    val th = PerplexityBuckets.tercileThresholds(scored, "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(th("a") == (3L, 6L), s"got ${th("a")}")
    // group b: n=7, ceil(7/3)=3, ceil(14/3)=5 — the 5-doc tie at 10
    // already covers both cuts, so t1=t2=10 and head absorbs the tie
    assert(th("b") == (10L, 10L), s"got ${th("b")}")
  }

  test("bucketed: head/middle/tail assignment incl. threshold ties") {
    val scored = ((1 to 9).map(v => ("a", v.toLong, v.toLong)) ++
      Seq(("b", 100L, 10L), ("b", 101L, 10L), ("b", 102L, 10L),
        ("b", 103L, 10L), ("b", 104L, 10L), ("b", 105L, 20L), ("b", 106L, 30L)))
      .toDF("g", "doc_id", "nll_milli")
    val bk = PerplexityBuckets.bucketed(scored, "g")
      .select("g", "doc_id", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    (1 to 3).foreach(v => assert(bk(("a", v.toLong)) == "head"))
    (4 to 6).foreach(v => assert(bk(("a", v.toLong)) == "middle"))
    (7 to 9).foreach(v => assert(bk(("a", v.toLong)) == "tail"))
    // the whole 5-doc tie class lands in head (value-based cut); its
    // cum count 5 covers BOTH cuts (ceil(7/3)=3, ceil(14/3)=5), so
    // t1=t2=10, middle is empty and everything above is tail
    (100L to 104L).foreach(id => assert(bk(("b", id)) == "head"))
    assert(bk(("b", 105L)) == "tail" && bk(("b", 106L)) == "tail")
  }

  test("the tercile window runs over the bounded histogram, not the corpus") {
    // many docs, FEW distinct nll values: the window input must be
    // value-count-sized. Pin the plan: the Window's child aggregates
    // (group, nll) BEFORE the sort — i.e. Window sits above Aggregate
    val scored = (1 to 5000).map(i => ("g", (i % 7).toLong)).toDF("g", "nll_milli")
    val th = PerplexityBuckets.tercileThresholds(scored, "g")
    val plan = th.queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"Window must consume the histogram Aggregate, not corpus rows:\n$plan")
    assert(th.count() == 1)
  }

  test("tokenScores: llq is the exact sum of per-word Viterbi scores") {
    val planted: Array[(String, Long)] = Array(
      "prefix" -> 12L, "fixing" -> 12L, "prerun" -> 10L,
      "runing" -> 10L, "runfix" -> 8L, "prefixing" -> 4L)
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 5)
    val df = Seq((1L, "prefix runing zz"), (2L, "prefixing"), (3L, ""))
      .toDF("doc_id", "text")
    val got = UnigramLm.tokenScores(df, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def wordLlq(w: String): Long =
      model.segment(w).map(p => model.llq.getOrElse(p, UnigramLm.UnkLlq)).sum
    assert(got(1L)._3 == Seq("prefix", "runing", "zz").map(wordLlq).sum)
    assert(got(1L)._2 == Seq("prefix", "runing", "zz").map(model.tokenCount).sum)
    assert(got(2L)._3 == wordLlq("prefixing") && got(2L)._1 == 1L)
    assert(got(3L) == ((0L, 0L, 0L)), "empty text: zero words, tokens, llq")
  }
}
