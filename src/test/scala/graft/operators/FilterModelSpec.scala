package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterModelSpec extends SparkSpec {

  test("logisticGd: one step on the symmetric separable fixture is the closed form") {
    import spark.implicits._
    // x = ±1 split by label, balanced: under w = 0 every p = 0.5, so
    // grad_bias = avg(0.5 − y) = 0 and grad_x = avg((0.5 − y)·x) = −0.5
    // → after ONE step w = (0, 0.5), and σ(0.5·x) already classifies
    // every row correctly
    val df = ((1 to 20).map(_ => (true, 1.0)) ++ (1 to 20).map(_ => (false, -1.0)))
      .toDF("y", "x")
    val r = FilterModel.logisticGd(df, Seq("x"), "y",
      iterations = 1, learningRate = 1.0).orderBy("term_idx").collect()
    assert(r.map(_.getAs[String]("term")).toSeq == Seq("bias", "x"))
    assert(r(0).getAs[Double]("weight") == 0.0)
    assert(r(1).getAs[Double]("weight") == 0.5)
    assert(r.forall(_.getAs[Long]("n") == 40))
    assert(r.forall(_.getAs[Double]("accuracy") == 1.0))
    graft.Caches.unpersistAll()
  }

  test("logisticGd: loss decreases with more steps; separable data → accuracy 1") {
    import spark.implicits._
    val df = ((1 to 30).map(i => (true, 1.0 + i * 0.01))
      ++ (1 to 30).map(i => (false, -1.0 - i * 0.01))).toDF("y", "x")
    def lossAt(iters: Int): Double =
      FilterModel.logisticGd(df, Seq("x"), "y", iters, learningRate = 1.0)
        .collect()(0).getAs[Double]("log_loss")
    val l1 = lossAt(1); val l10 = lossAt(10)
    assert(l10 < l1, s"10 steps should beat 1 step: $l10 vs $l1")
    val acc = FilterModel.logisticGd(df, Seq("x"), "y", 10, 1.0)
      .collect()(0).getAs[Double]("accuracy")
    assert(acc == 1.0)
    graft.Caches.unpersistAll()
  }

  test("logisticGd: an all-zero feature keeps weight exactly 0; null rows drop") {
    import spark.implicits._
    val df = Seq((Some(true), Some(1.0), Some(0.0)), (Some(false), Some(-1.0), Some(0.0)),
      (Some(true), None, Some(0.0)), (None, Some(2.0), Some(0.0)))
      .toDF("y", "x", "z")
    val r = FilterModel.logisticGd(df, Seq("x", "z"), "y",
      iterations = 5, learningRate = 1.0).orderBy("term_idx").collect()
    assert(r.forall(_.getAs[Long]("n") == 2), "null label/feature rows must drop")
    assert(r(2).getAs[String]("term") == "z" && r(2).getAs[Double]("weight") == 0.0)
    graft.Caches.unpersistAll()
  }
}
