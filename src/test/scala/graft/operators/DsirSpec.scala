package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private def weights(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("importanceWeights: target == raw gives exactly zero everywhere") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "beta beta"))
      .toDF("doc_id", "text")
    val w = weights(Dsir.importanceWeights(docs, docs, "doc_id", "text"))
    // p̂ and q̂ are the SAME model: every log-ratio term cancels to 0.0
    // in identical float arithmetic, not merely approximately
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w.values.forall(_._2 == 0.0))
  }

  test("importanceWeights: buckets = 1 collapses both models to certainty, weight 0") {
    import spark.implicits._
    val raw = Seq((1L, "x y z"), (2L, "q")).toDF("doc_id", "text")
    val tgt = Seq((9L, "only this")).toDF("doc_id", "text")
    val w = weights(Dsir.importanceWeights(raw, tgt, "doc_id", "text", buckets = 1))
    assert(w.values.forall(_._2 == 0.0))
  }

  test("importanceWeights: on-target doc outscores off-target, exact hand formula") {
    import spark.implicits._
    // target "aa bb": grams {aa, bb, "aa bb"}, N_t = 3
    // raw adds "cc dd": raw gram counts all 1, N_r = 6; α = 1, B = 1024
    val raw = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val tgt = Seq((9L, "aa bb")).toDF("doc_id", "text")
    val w = weights(Dsir.importanceWeights(raw, tgt, "doc_id", "text", buckets = 1024))
    val w1 = 3.0 * (math.log(2.0 / 1027) - math.log(2.0 / 1030))
    val w2 = 3.0 * (math.log(1.0 / 1027) - math.log(2.0 / 1030))
    assert(math.abs(w(1L)._2 - w1) < 1e-9)
    assert(math.abs(w(2L)._2 - w2) < 1e-9)
    assert(w(1L)._2 > 0 && w(2L)._2 < 0 && w(1L)._2 > w(2L)._2)
  }

  test("importanceWeights: n_grams = 2n−1; empty and whitespace docs drop") {
    import spark.implicits._
    val raw = Seq((1L, "a b c d"), (2L, "solo"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val tgt = Seq((9L, "a b")).toDF("doc_id", "text")
    val w = weights(Dsir.importanceWeights(raw, tgt, "doc_id", "text"))
    assert(w.keySet == Set(1L, 2L), "token-less docs carry no evidence")
    assert(w(1L)._1 == 7L, "4 unigrams + 3 bigrams")
    assert(w(2L)._1 == 1L)
  }

  test("importanceWeights: deterministic across partitionings") {
    import spark.implicits._
    val raw = (1 to 60).map(i => (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") % 2 === 0)
    val a = weights(Dsir.importanceWeights(raw, tgt, "doc_id", "text"))
      .map { case (k, (n, x)) => (k, n, math.round(x * 1e6)) }
    val b = weights(Dsir.importanceWeights(raw.repartition(13), tgt.repartition(3),
        "doc_id", "text"))
      .map { case (k, (n, x)) => (k, n, math.round(x * 1e6)) }
    assert(a == b)
  }
}
