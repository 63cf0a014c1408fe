package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  test("targetEncodeLoo: own row excluded; singleton falls back to global LOO mean") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0),                    // singleton category
      (5L, "c", 1.0), (6L, "c", 3.0)
    ).toDF("id", "cat", "y")
    val got = Features.targetEncodeLoo(df, "id", "cat", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 25.0)  // (20+30)/2
    assert(got(2L) == 20.0)  // (10+30)/2
    assert(got(3L) == 15.0)
    // singleton: global sum 164 minus own 100, over 5 other rows
    assert(got(4L) == (164.0 - 100.0) / 5)
    assert(got(5L) == 3.0 && got(6L) == 1.0)
  }

  test("quantileBins: equi-depth bins, boundary values go left ((lo, hi] convention)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val bps = Features.fitQuantileBins(df, "v", 4)
      .orderBy("bin").collect().map(_.getDouble(1))
    assert(bps.toSeq == Seq(25.75, 50.5, 75.25)) // (n-1)*p interpolation
    val binned = Features.quantileBins(df, "v", 4)
    val counts = binned.groupBy("bin").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 25, 2 -> 25, 3 -> 25, 4 -> 25))
    // a value exactly at a breakpoint lands in the LOWER bin
    val at = Features.applyQuantileBins(
      Seq((0L, 50.5)).toDF("id", "v"), "v",
      Features.fitQuantileBins(df, "v", 4))
      .select("bin").collect()(0).getInt(0)
    assert(at == 2)
  }

  test("quantileBins transform is fit-then-broadcast: corpus side has no extra shuffle") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val plan = Features.quantileBins(df, "v", 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast of K-sized breakpoints, got:\n$plan")
  }
}
