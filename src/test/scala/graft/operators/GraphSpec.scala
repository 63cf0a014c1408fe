package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank: symmetric two-node graph is the uniform fixed point") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    for (iters <- Seq(0, 1, 5)) {
      val pr = ranks(Graph.pageRank(e, "src", "dst", iters))
      assert(pr.keySet == Set("a", "b"))
      assert(math.abs(pr("a") - 0.5) < 1e-12 && math.abs(pr("b") - 0.5) < 1e-12)
    }
  }

  test("pageRank: one directed iteration matches the hand formula") {
    import spark.implicits._
    // a -> b, a -> c (outdeg 2), b -> a (outdeg 1); c dangling. N = 3.
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    val pr = ranks(Graph.pageRank(e, "src", "dst", 1))
    val teleport = 0.15 / 3
    assert(math.abs(pr("a") - (teleport + 0.85 * (1.0 / 3))) < 1e-12)
    assert(math.abs(pr("b") - (teleport + 0.85 * (1.0 / 6))) < 1e-12)
    assert(math.abs(pr("c") - (teleport + 0.85 * (1.0 / 6))) < 1e-12)
    // dangling node c absorbs rank: total mass < 1 (the documented
    // simple variant — symmetrize for conservation)
    assert(pr.values.sum < 1.0)
  }

  test("pageRank: duplicate edges collapse to one vote") {
    import spark.implicits._
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a")).toDF("s", "d")
    val one = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    assert(ranks(Graph.pageRank(dup, "s", "d", 3)) ==
      ranks(Graph.pageRank(one, "s", "d", 3)))
  }

  test("pageRank: symmetrized graph conserves total rank mass") {
    import spark.implicits._
    val fwd = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")).toDF("s", "d")
    val sym = fwd.unionByName(fwd.select(col("d").as("s"), col("s").as("d")))
    val pr = ranks(Graph.pageRank(sym, "s", "d", 4))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // higher-degree nodes rank higher on this graph (b, c have degree 2
    // and 3; a has 2, d has 1)
    assert(pr("c") > pr("d"))
  }

  test("pageRank: iterations = 0 returns the uniform start") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("c", "d")).toDF("s", "d")
    val pr = ranks(Graph.pageRank(e, "s", "d", 0))
    assert(pr.values.forall(v => math.abs(v - 0.25) < 1e-12))
  }
}
