package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  private def metricsOf(results: Seq[(String, String, Int)],
                        judgments: Seq[(String, String, Double)],
                        k: Int): Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    Retrieval.rankingMetrics(
      results.toDF("q", "d", "rank"), judgments.toDF("q", "d", "grade"),
      "q", "d", "rank", "grade", k)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("graded nDCG/MRR/P/R match the hand computation") {
    val m = metricsOf(
      results = Seq(("A", "d9", 1), ("A", "d1", 2), ("A", "d2", 3)),
      judgments = Seq(("A", "d1", 2.0), ("A", "d2", 1.0), ("A", "d3", 1.0)),
      k = 3)("A")
    assert(m.getAs[Long]("n_relevant_total") == 3L)
    assert(m.getAs[Long]("n_relevant_retrieved") == 2L)
    assert(math.abs(m.getAs[Double]("precision_k") - 2.0 / 3) < 1e-9)
    assert(math.abs(m.getAs[Double]("recall_k") - 2.0 / 3) < 1e-9)
    assert(math.abs(m.getAs[Double]("mrr") - 0.5) < 1e-9)
    // dcg = 3/log2(3) + 1/log2(4); idcg = 3/log2(2) + 1/log2(3) + 1/log2(4)
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 0.5
    val idcg = 3.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(m.getAs[Double]("ndcg") - dcg / idcg) < 1e-9)
  }

  test("no judged relevant docs: recall/mrr/ndcg are 0, never null or NaN") {
    val m = metricsOf(
      results = Seq(("B", "d1", 1), ("B", "d2", 2)),
      judgments = Seq(("B", "d1", 0.0)), // judged NOT relevant
      k = 2)("B")
    assert(m.getAs[Long]("n_relevant_total") == 0L)
    assert(m.getAs[Double]("recall_k") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("ndcg") == 0.0)
  }

  test("ideal order gives ndcg exactly 1; ranks beyond k are ignored") {
    val m = metricsOf(
      results = Seq(("C", "d1", 1), ("C", "d2", 2), ("C", "junk", 3)),
      judgments = Seq(("C", "d1", 2.0), ("C", "d2", 1.0)),
      k = 2)("C") // rank-3 row must not contribute
    assert(m.getAs[Long]("n_retrieved") == 2L)
    assert(m.getAs[Double]("ndcg") == 1.0)
    assert(m.getAs[Double]("mrr") == 1.0)
  }

  test("more judged relevant than k: idcg truncates at k, perfect prefix still 1") {
    val m = metricsOf(
      results = Seq(("D", "d1", 1), ("D", "d2", 2)),
      judgments = Seq(("D", "d1", 1.0), ("D", "d2", 1.0),
        ("D", "d3", 1.0), ("D", "d4", 1.0)),
      k = 2)("D")
    // retrieved the best possible 2 of 4 relevant: ndcg = 1, recall = 1/2
    assert(m.getAs[Double]("ndcg") == 1.0)
    assert(math.abs(m.getAs[Double]("recall_k") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("precision_k") - 1.0) < 1e-9)
  }

  private def negsOf(results: Seq[(String, String, Int, Double)],
                     positives: Seq[(String, String)],
                     n: Int): Seq[(String, Int, String, Double)] = {
    import spark.implicits._
    Retrieval.hardNegatives(
        results.toDF("q", "d", "rank", "score"), positives.toDF("q", "d"),
        "q", "d", "rank", n)
      .select("q", "neg_rank", "d", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("hardNegatives: positives removed, ranks re-densified, scores pass through") {
    val out = negsOf(
      results = Seq(("A", "p1", 1, 0.9), ("A", "n1", 2, 0.8),
        ("A", "p2", 3, 0.7), ("A", "n2", 4, 0.6), ("A", "n3", 5, 0.5)),
      positives = Seq(("A", "p1"), ("A", "p2"), ("B", "p1")),
      n = 2)
    // p1/p3 drop, survivors keep candidate order, neg_rank densifies to 1..n
    assert(out == Seq(("A", 1, "n1", 0.8), ("A", 2, "n2", 0.6)))
  }

  test("hardNegatives: positives of OTHER queries don't leak; all-positive list yields none") {
    val out = negsOf(
      results = Seq(("A", "x", 1, 0.9), ("A", "y", 2, 0.8),
        ("B", "x", 1, 0.9), ("B", "y", 2, 0.8)),
      positives = Seq(("A", "x"), ("A", "y"), ("B", "z")),
      n = 5)
    // A's candidates are all positive -> zero rows, no padding;
    // B keeps both (its positive z wasn't retrieved; A's x/y are not B's)
    assert(out == Seq(("B", 1, "x", 0.9), ("B", 2, "y", 0.8)))
  }

  test("hardNegatives: duplicate positive pairs don't multiply survivors") {
    val out = negsOf(
      results = Seq(("A", "p", 1, 0.9), ("A", "n", 2, 0.8)),
      positives = Seq(("A", "p"), ("A", "p"), ("A", "p")),
      n = 3)
    assert(out == Seq(("A", 1, "n", 0.8)))
  }

  private def fuse(runA: Seq[(String, String, Int)], runB: Seq[(String, String, Int)],
                   k: Int = 60, topN: Int = 10): Seq[(String, Int, String, Double, Long)] = {
    import spark.implicits._
    Retrieval.rrfFusion(
        Seq(runA.toDF("q", "d", "rank"), runB.toDF("q", "d", "rank")),
        "q", "d", "rank", k, topN)
      .select("q", "fused_rank", "d", "rrf_score", "n_runs")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("rrfFusion: hand-computed scores, single-run docs included, ranks densify") {
    val out = fuse(
      runA = Seq(("Q", "d1", 1), ("Q", "d2", 2)),
      runB = Seq(("Q", "d2", 1), ("Q", "d3", 2)))
    // d2: 1/62 + 1/61; d1: 1/61; d3: 1/62 — d2 > d1 > d3
    val (s2, s1, s3) = (1.0 / 62 + 1.0 / 61, 1.0 / 61, 1.0 / 62)
    assert(out == Seq(
      ("Q", 1, "d2", s2, 2L), ("Q", 2, "d1", s1, 1L), ("Q", 3, "d3", s3, 1L)))
  }

  test("rrfFusion: equal scores tie-break by doc id; topN caps; queries stay separate") {
    val out = fuse(
      runA = Seq(("Q", "zz", 3), ("Q", "aa", 3), ("R", "x", 1)),
      runB = Seq(("Q", "mm", 3), ("R", "y", 1)),
      topN = 2)
    // all three Q docs score 1/63 — doc-id order, capped at 2
    assert(out.filter(_._1 == "Q").map(t => (t._2, t._3)) == Seq((1, "aa"), (2, "mm")))
    assert(out.filter(_._1 == "R").map(t => (t._2, t._3)) == Seq((1, "x"), (2, "y")))
  }

  test("mmrDiversify: defers the near-duplicate of the top pick in favor of a diverse doc") {
    import spark.implicits._
    // d2 ≈ duplicate of d1 (cosine ≈ 1): pure relevance would rank it
    // second; MMR's redundancy penalty pushes orthogonal d3 ahead
    val cands = Seq(
      (1L, 10L, 0.95, Array(1f, 0f, 0f)),
      (1L, 11L, 0.90, Array(1f, 0.001f, 0f)),
      (1L, 12L, 0.50, Array(0f, 1f, 0f))
    ).toDF("query_id", "doc_id", "rel", "emb")
    val got = Retrieval.mmrDiversify(cands, "query_id", "doc_id", "rel", "emb",
        lambda = 0.7, k = 3)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getAs[Long]("mmr_rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == Seq((1L, 10L), (2L, 12L), (3L, 11L)),
      s"expected diverse ordering, got ${got.toSeq}")
  }

  test("mmrDiversify: a query with fewer candidates than k stops early; ranks stay dense") {
    import spark.implicits._
    val cands = Seq(
      (7L, 1L, 0.9, Array(1f, 0f)),
      (7L, 2L, 0.8, Array(0f, 1f))
    ).toDF("query_id", "doc_id", "rel", "emb")
    val got = Retrieval.mmrDiversify(cands, "query_id", "doc_id", "rel", "emb", 0.7, 5)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getAs[Long]("mmr_rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("rankBiasedOverlap: identical → 1−p^k, disjoint → 0, rank-1 swaps cost more than rank-k") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, Int)]) = rows.toDF("q", "d", "r")
    def rbo(a: Seq[(Long, String, Int)], b: Seq[(Long, String, Int)]) =
      Retrieval.rankBiasedOverlap(run(a), run(b), "q", "d", "r", k = 3, p = 0.9)
        .collect()(0).getAs[Double]("rbo")
    val base = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3))
    // identical rankings: sum_(d=1..k) (1-p) p^(d-1) = 1 - p^k
    assert(math.abs(rbo(base, base) - (1 - math.pow(0.9, 3))) < 1e-12)
    assert(rbo(base, Seq((1L, "x", 1), (1L, "y", 2), (1L, "z", 3))) == 0.0)
    // swapping rank 1 for a foreign doc hurts more than swapping rank 3
    val swapTop = Seq((1L, "x", 1), (1L, "b", 2), (1L, "c", 3))
    val swapBot = Seq((1L, "a", 1), (1L, "b", 2), (1L, "x", 3))
    assert(rbo(base, swapTop) < rbo(base, swapBot),
      "top-rank disagreement must cost more")
  }

  test("mmrDiversify at lambda = 1 is pure relevance order") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 0.3, Array(1f, 0f)),
      (1L, 11L, 0.9, Array(1f, 0.001f)),
      (1L, 12L, 0.6, Array(0f, 1f))
    ).toDF("query_id", "doc_id", "rel", "emb")
    val got = Retrieval.mmrDiversify(cands, "query_id", "doc_id", "rel", "emb", 1.0, 3)
      .orderBy("mmr_rank").collect().map(_.getAs[Long]("doc_id"))
    assert(got.toSeq == Seq(11L, 12L, 10L))
  }
}
