package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSpec {

  test("bm25 matches a hand-computed score on a tiny corpus") {
    import spark.implicits._
    // 3 docs; "cat" in docs 1 (tf=2, dl=4) and 2 (tf=1, dl=2); N=3, avgdl=3
    val df = Seq(
      (1L, "cat sat cat mat"),
      (2L, "cat dog"),
      (3L, "dog dog fox")).toDF("doc_id", "text")
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def norm(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
    val got = Scoring.bm25(df, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - idf * norm(2, 4)) < 1e-12)
    assert(math.abs(got(2L) - idf * norm(1, 2)) < 1e-12)
    // longer doc with same tf scores lower (length normalization)
    val longer = Scoring.bm25(
      Seq((1L, "cat a b c d e f g h"), (2L, "cat a")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(longer(1L) < longer(2L))
  }

  test("bm25 ignores docs without query terms; multi-term scores sum") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    val single = Scoring.bm25(df, "doc_id", "text", Seq("alpha"))
      .collect().map(r => r.getLong(0)).toSet
    assert(single == Set(1L))
    val multi = Scoring.bm25(df, "doc_id", "text", Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(multi == Map(1L -> 2L))
  }

  test("tfIdf: a term in every doc has weight 0; rare terms weigh more") {
    import spark.implicits._
    val df = Seq(
      (1L, "common rare"),
      (2L, "common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val w = Scoring.tfIdf(df, "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(3)).toMap
    assert(math.abs(w(("common", 1L))) < 1e-12) // idf = ln(3/3) = 0
    // tf=1 · ln(3/1); tolerance: Spark's codegen'd log is StrictMath-
    // based and may differ from Math.log in the last ulp
    assert(math.abs(w(("rare", 1L)) - math.log(3.0)) < 1e-14)
    assert(w(("rare", 1L)) > w(("other", 3L)) - 1e-12)
  }

  test("vocabTable: tf counts occurrences, df counts docs, empties dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "cat sat cat"),
      (2L, "cat dog"),
      (3L, ""),
      (4L, "   ")).toDF("doc_id", "text")
    val got = Scoring.vocabTable(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("cat" -> ((3L, 2L)), "sat" -> ((1L, 1L)), "dog" -> ((1L, 1L))),
      got.toString)
    // approx df stays within its advertised error on a small vocab
    val approx = Scoring.vocabTable(df, "doc_id", "text", exactDf = false)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx("cat") == 2L && approx("sat") == 1L)
  }

  test("bm25 plan: dfreq and corpus stats are broadcast, tf side is not") {
    import spark.implicits._
    val df = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val plan = Scoring.bm25(df, "doc_id", "text", Seq("y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
