package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {

  test("sign matrix is deterministic, ±1/√dOut, and md5-derived") {
    val m = Projection.signMatrix(8, 4)
    val m2 = Projection.signMatrix(8, 4)
    assert(m.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m.flatten.forall(v => math.abs(v) == 0.5)) // 1/√4
    assert(m.flatten.toSet.size == 2)                 // both signs occur
  }

  test("projection is the literal matrix-vector product") {
    import spark.implicits._
    val dIn = 8
    val v = Array.tabulate(dIn)(i => (i + 1).toFloat)
    val df = Seq((1L, v.toSeq)).toDF("id", "vec")
    val got = Projection.randomProject(df, "vec", dIn, 4, "proj")
      .select(col("proj")).collect()(0).getSeq[Double](0)
    val m = Projection.signMatrix(dIn, 4)
    val want = m.map(row => row.zip(v.map(_.toDouble)).map { case (s, x) => s * x }.sum)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("JL property: pairwise distances roughly preserved 64→16") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("id", "vec")
    val proj = Projection.randomProject(df, "vec", 64, 16, "p")
      .select("id", "p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val ratios = for {
      i <- 0L until 20L; j <- (i + 1) until 20L
    } yield dist(proj(i), proj(j)) / dist(orig(i), orig(j))
    // ±1 JL at dOut=16 concentrates within ~3/√16; allow a wide band —
    // catastrophic failure (a broken matrix) lands far outside it
    assert(ratios.forall(r => r > 0.4 && r < 1.8),
      s"distance ratios out of band: min=${ratios.min} max=${ratios.max}")
  }

  test("null vectors project to null; plan stays map-side (no exchange)") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.fill(4)(1.0f))), (2L, None))
      .toDF("id", "vec")
    val out = Projection.randomProject(df, "vec", 4, 2, "p")
    val rows = out.orderBy("id").select("p").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("rejects dOut > dIn") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Projection.randomProject(Seq((1L, Seq(1.0f))).toDF("id", "v"), "v", 1, 2, "p")
    }
  }

  test("pcaTopComponent recovers a planted dominant direction") {
    import spark.implicits._
    // variance 3:1 along (1,1,0)/√2 vs (0,0,1): top component is the
    // planted diagonal, up to the sign convention (max |loading| > 0)
    val planted = Seq(3.0, -3.0, 2.0, -2.0, 1.0, -1.0).map(a => Seq(a, a, 0.0))
    val noise = Seq(1.0, -1.0).map(b => Seq(0.0, 0.0, b))
    val df = (planted ++ noise).toDF("v")
    val got = Projection.pcaTopComponent(df, "v", dim = 3, iterations = 30)
      .orderBy("component")
      .select("loading").as[Double].collect().toSeq
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(got(0) - inv) < 1e-6 && math.abs(got(1) - inv) < 1e-6,
      s"expected the (1,1,0)/sqrt2 direction, got $got")
    assert(math.abs(got(2)) < 1e-6, s"no mass on the minor axis: $got")
  }

  test("pcaTopComponent sign convention: max-|loading| component positive") {
    import spark.implicits._
    // data along (0, -1): power iteration may land on either sign — the
    // convention must flip it so loading(2) is positive
    val df = Seq(Seq(0.0, 5.0), Seq(0.0, -5.0), Seq(0.1, 0.0), Seq(-0.1, 0.0))
      .toDF("v")
    val got = Projection.pcaTopComponent(df, "v", dim = 2, iterations = 20)
      .orderBy("component").select("loading").as[Double].collect().toSeq
    assert(got(1) > 0.999, s"dominant loading must be positive: $got")
  }

  test("pcaTopComponent: eigenvalue/var_share arithmetic on a hand case") {
    import spark.implicits._
    // two points (±1, 0): mean 0, scatter diag(2, 0) → λ=2, trace=2,
    // var_share=1, eigenvector (1, 0)
    val df = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0)).toDF("v")
    val row = Projection.pcaTopComponent(df, "v", dim = 2, iterations = 10)
      .orderBy("component").collect()
    assert(row(0).getDouble(1) == 1.0 && row(1).getDouble(1) == 0.0, row.toSeq)
    assert(row(0).getDouble(2) == 2.0, "eigenvalue = 2")
    assert(row(0).getDouble(3) == 1.0, "var_share = 1")
  }

  test("pcaComponents: deflation yields orthogonal components with ordered eigenvalues") {
    import spark.implicits._
    // axis-aligned variance 9 : 4 : 1 → components e1, e2 with λ 18, 8
    val df = Seq(
      Seq(3.0, 0.0, 0.0), Seq(-3.0, 0.0, 0.0),
      Seq(0.0, 2.0, 0.0), Seq(0.0, -2.0, 0.0),
      Seq(0.0, 0.0, 1.0), Seq(0.0, 0.0, -1.0)).toDF("v")
    val rows = Projection.pcaComponents(df, "v", dim = 3, k = 2, iterations = 40)
      .orderBy("pc", "component").collect()
    val pc1 = rows.filter(_.getLong(0) == 1L).map(_.getDouble(2))
    val pc2 = rows.filter(_.getLong(0) == 2L).map(_.getDouble(2))
    assert(math.abs(pc1(0) - 1.0) < 1e-5 && math.abs(pc1(1)) < 1e-5, pc1.toSeq)
    assert(math.abs(pc2(1) - 1.0) < 1e-5 && math.abs(pc2(0)) < 1e-5, pc2.toSeq)
    val dot = pc1.zip(pc2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-5, s"components must be orthogonal, dot=$dot")
    val l1 = rows.filter(_.getLong(0) == 1L).head.getDouble(3)
    val l2 = rows.filter(_.getLong(0) == 2L).head.getDouble(3)
    assert(l1 == 18.0 && l2 == 8.0, s"eigenvalues 18/8, got $l1/$l2")
    // shares against the ORIGINAL trace (18+8+2 = 28): 18/28
    assert(rows.head.getDouble(4) == BigDecimal(18.0 / 28)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pcaTopComponent drops null / wrong-dimension vectors; empty input refuses") {
    import spark.implicits._
    val df = Seq(Some(Seq(1.0, 0.0)), Some(Seq(-1.0, 0.0)),
      None, Some(Seq(1.0, 2.0, 3.0))).toDF("v")
    val row = Projection.pcaTopComponent(df, "v", dim = 2, iterations = 5)
      .orderBy("component").collect()
    assert(row(0).getDouble(2) == 2.0, "only the two valid vectors count")
    intercept[IllegalArgumentException] {
      Projection.pcaTopComponent(
        Seq(Seq(1.0, 2.0, 3.0)).toDF("v"), "v", dim = 2, iterations = 5)
    }
  }
}
