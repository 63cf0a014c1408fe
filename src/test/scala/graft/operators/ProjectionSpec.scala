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
}
