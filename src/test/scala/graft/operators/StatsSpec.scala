package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("poissonWeight: deterministic, bounded 0..7, mean ≈ 1 over many draws") {
    import spark.implicits._
    val units = (1 to 5000).map(i => Tuple1(i.toLong)).toDF("id")
    val w = units.select(Stats.poissonWeight(col("id"), lit(1)).as("w"))
    val stats = w.agg(min("w"), max("w"), avg("w")).collect()(0)
    assert(stats.getLong(0) >= 0 && stats.getLong(1) <= 7)
    val mean = stats.getDouble(2)
    assert(mean > 0.93 && mean < 1.07, s"Poisson(1) mean should be ~1, got $mean")
    // identical (unit, b) → identical weight on a fresh evaluation
    val again = units.select(Stats.poissonWeight(col("id"), lit(1)).as("w"))
    assert(w.except(again).count() == 0 && again.except(w).count() == 0)
  }

  test("poissonBootstrapMeans: constant column → every replicate mean is the constant") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val means = Stats.poissonBootstrapMeans(df, "id", "v", nReplicates = 20)
      .collect()
    assert(means.length == 20)
    assert(means.forall(_.getAs[Double]("mean_b") == 5.0))
  }

  test("poissonBootstrapCI brackets the point estimate and narrows with n") {
    import spark.implicits._
    val small = (1 to 40).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val big = (1 to 4000).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    def ci(df: org.apache.spark.sql.DataFrame) = {
      val r = Stats.poissonBootstrapCI(df, "id", "v", nReplicates = 100).collect()(0)
      (r.getAs[Double]("ci_lo"), r.getAs[Double]("point_mean"), r.getAs[Double]("ci_hi"))
    }
    val (lo1, pt1, hi1) = ci(small)
    val (lo2, pt2, hi2) = ci(big)
    assert(lo1 <= pt1 && pt1 <= hi1, s"CI must bracket the mean: $lo1 $pt1 $hi1")
    assert(lo2 <= pt2 && pt2 <= hi2)
    assert(hi2 - lo2 < hi1 - lo1, "100x more data → tighter interval")
  }

  test("cohensKappa: perfect agreement → 1; hand-computed 2x2 case → 0.5") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohensKappa(perfect, "a", "b")
      .collect()(0).getAs[Double]("kappa") == 1.0)
    // agree 3/4; marginals A(x2,y2) B(x1,y3): pe = (2*1+2*3)/16 = 0.5
    val mixed = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")).toDF("a", "b")
    val r = Stats.cohensKappa(mixed, "a", "b").collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("po") == 0.75 && r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.5)
  }

  test("cohensKappa counts null labels as a level (null-safe agreement)") {
    import spark.implicits._
    val df = Seq((Some("x"), Some("x")), (None, None), (Some("y"), None))
      .toDF("a", "b")
    val r = Stats.cohensKappa(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("po") == 2.0 / 3)
  }

  test("pairedBootstrapDelta: constant uplift → every replicate wins, CI degenerate at the uplift") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, (i % 7 + 10).toLong, (i % 7).toLong))
      .toDF("id", "a", "b")
    val r = Stats.pairedBootstrapDelta(df, "id", "a", "b", nReplicates = 50).collect()(0)
    assert(r.getAs[Long]("n") == 200)
    assert(r.getAs[Long]("n_replicates") == 50)
    // per-unit delta is exactly 10, so every reweighted mean is exactly 10
    assert(r.getAs[Double]("delta") == 10.0)
    assert(r.getAs[Double]("ci_lo") == 10.0 && r.getAs[Double]("ci_hi") == 10.0)
    assert(r.getAs[Double]("frac_a_better") == 1.0)
    assert(r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b") == 10.0)
  }

  test("pairedBootstrapDelta: identical systems → zero delta, zero wins") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 13).toLong, (i % 13).toLong))
      .toDF("id", "a", "b")
    val r = Stats.pairedBootstrapDelta(df, "id", "a", "b", nReplicates = 40).collect()(0)
    assert(r.getAs[Double]("delta") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 0.0 && r.getAs[Double]("ci_hi") == 0.0)
    // "a better" is a STRICT win — a tie is not significance
    assert(r.getAs[Double]("frac_a_better") == 0.0)
  }

  test("pairedBootstrapDelta: noisy mixed-sign deltas → CI brackets the point delta, frac interior, deterministic") {
    import spark.implicits._
    // a wins on ~2/3 of units by 1, loses on 1/3 by 2 → mean delta ≈ 0
    val df = (1 to 300).map { i =>
      val d = if (i % 3 == 0) -2L else 1L
      (i.toLong, 100L + d, 100L)
    }.toDF("id", "a", "b")
    val r1 = Stats.pairedBootstrapDelta(df, "id", "a", "b", nReplicates = 100).collect()(0)
    assert(r1.getAs[Double]("ci_lo") <= r1.getAs[Double]("delta"))
    assert(r1.getAs[Double]("delta") <= r1.getAs[Double]("ci_hi"))
    val frac = r1.getAs[Double]("frac_a_better")
    assert(frac > 0.0 && frac < 1.0,
      s"a mean-zero paired delta must not be called significant either way, got $frac")
    // deterministic draws: a rerun reproduces every field exactly
    val r2 = Stats.pairedBootstrapDelta(df, "id", "a", "b", nReplicates = 100).collect()(0)
    assert(r1 == r2)
  }

  test("calibration: hand-computed three-bin reliability table and ECE") {
    import spark.implicits._
    // IEEE floor, not decimal: 0.85 * 10 = 8.4999... -> bin 8
    // bin 9: conf .95, 1 of 1 correct  -> gap |1 - .95| = .05
    // bin 8: conf .85, 0 of 1 correct  -> gap |0 - .85| = .85
    // bin 2: conf .25 x2, 2 of 2 correct -> gap |1 - .25| = .75
    // ECE = (1*.05 + 1*.85 + 2*.75)/4 = .6
    val df = Seq((0.95, true), (0.85, false), (0.25, true), (0.25, true))
      .toDF("conf", "correct")
    val rows = Stats.calibration(df, "conf", "correct", nBins = 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 8L, 9L))
    val b2 = rows(0); val b8 = rows(1); val b9 = rows(2)
    assert(b2.getLong(1) == 2 && b8.getLong(1) == 1 && b9.getLong(1) == 1)
    assert(math.abs(b2.getDouble(2) - 0.25) < 1e-12)
    assert(math.abs(b2.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(b8.getDouble(2) - 0.85) < 1e-12)
    assert(math.abs(b8.getDouble(3) - 0.0) < 1e-12)
    assert(math.abs(b9.getDouble(2) - 0.95) < 1e-12)
    assert(math.abs(b9.getDouble(3) - 1.0) < 1e-12)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("ece") - 0.6) < 1e-12))
    graft.Caches.unpersistAll()
  }

  test("calibration: conf 1.0 folds into the top bin; perfect calibration -> ECE 0") {
    import spark.implicits._
    // every bin's accuracy equals its mean confidence exactly
    val df = Seq((1.0, true), (1.0, true),
      (0.5, true), (0.5, false)).toDF("conf", "correct")
    val rows = Stats.calibration(df, "conf", "correct", nBins = 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(5L, 9L))
    rows.foreach(r => assert(math.abs(r.getAs[Double]("ece")) < 1e-12))
    graft.Caches.unpersistAll()
  }
}
