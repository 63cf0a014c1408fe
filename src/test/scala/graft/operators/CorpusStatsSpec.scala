package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {

  test("chao1: hand-counted singletons/doubletons, bias-corrected estimate") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val r = CorpusStats.chao1(docs, "text").collect()(0)
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Long]("vocab") == 3)
    assert(r.getAs[Long]("f1") == 2 && r.getAs[Long]("f2") == 1)
    // 3 + 2*1 / (2*(1+1)) = 3.5
    assert(r.getAs[Double]("chao1") == 3.5)
  }

  test("chao1 with no doubletons stays finite (bias-corrected denominator)") {
    import spark.implicits._
    val r = CorpusStats.chao1(Seq((1L, "a b c")).toDF("doc_id", "text"), "text")
      .collect()(0)
    assert(r.getAs[Long]("f2") == 0)
    assert(r.getAs[Double]("chao1") == 3 + (3.0 * 2) / 2.0)
  }

  test("zipfSlope matches a locally computed OLS on the same points") {
    import spark.implicits._
    // freqs 5,3,2 at ranks 1,2,3 (ties impossible); compute expected OLS
    val docs = Seq((1L, ("a " * 5 + "b " * 3 + "c " * 2).trim))
      .toDF("doc_id", "text")
    val r = CorpusStats.zipfSlope(docs, "text", topN = 10).collect()(0)
    assert(r.getAs[Long]("n_ranks") == 3)
    val pts = Seq((1, 5), (2, 3), (3, 2))
      .map { case (rk, f) => (math.log(rk), math.log(f)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-12)
    assert(slope < -0.5 && slope > -1.5, "roughly zipfian fixture")
  }

  test("giniConcentration: equal shares → 0; concentrated shares → hand value") {
    import spark.implicits._
    val even = (1 to 4).map(i => (i.toLong, if (i <= 2) "s1" else "s2"))
      .toDF("id", "src")
    val g0 = CorpusStats.giniConcentration(even, "src").collect()(0)
    assert(g0.getAs[Long]("n_groups") == 2 && g0.getAs[Long]("total") == 4)
    assert(g0.getAs[Double]("gini") == 0.0)
    // sizes 1 and 9: G = 2*(1*1 + 2*9)/(2*10) - 3/2 = 0.4
    val skew = ((1 to 9).map(i => (i.toLong, "big")) :+ (10L, "small"))
      .toDF("id", "src")
    val g1 = CorpusStats.giniConcentration(skew, "src").collect()(0)
    assert(math.abs(g1.getAs[Double]("gini") - 0.4) < 1e-12)
  }

  test("zipfSlope plan: top-k is TakeOrdered, no full-vocabulary window") {
    import spark.implicits._
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val plan = CorpusStats.zipfSlope(docs, "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed partial top-k, got:\n$plan")
  }
}
