package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  test("asofBackward: latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "v")
    val quotes = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (1L, 20L, 250.0), (2L, 99L, 300.0))
      .toDF("k", "t", "ref")
    val got = TemporalJoins.asofBackward(trades, quotes, Seq("k"), "t", Seq("ref"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, 10L, Some(100.0)),   // quote@5
      (1L, 20L, Some(250.0)),   // quote at EXACT same time qualifies (<=)
      (2L, 15L, None)))         // no prior quote for key 2
  }

  test("asofBackward tie-break: last right row in tie order wins") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second")).toDF("k", "t", "seq", "v")
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "t", Seq("v"), tieCol = Some("seq"))
      .collect()(0).getAs[String]("asof_v")
    assert(got == "second")
  }

  test("asofBackward rejects a tieCol the right frame doesn't carry") {
    // regression: a missing tie column used to be silently dropped,
    // making results nondeterministic exactly when the tie-break matters
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, "v")).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(l, r, Seq("k"), "t", Seq("v"), tieCol = Some("seq"))
    }
    assert(e.getMessage.contains("seq"))
  }

  test("asofForward: earliest right row at-or-after each left time; first tie wins") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "v")
    val quotes = Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (1L, 20L, 250.0), (2L, 3L, 300.0))
      .toDF("k", "t", "ref")
    val got = TemporalJoins.asofForward(trades, quotes, Seq("k"), "t", Seq("ref"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, 10L, Some(200.0)),   // next quote@18
      (1L, 20L, Some(250.0)),   // exact same time qualifies (>=)
      (2L, 15L, None)))         // no later quote for key 2
    // tie: FIRST in tie order wins (mirror of backward's last-wins)
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second")).toDF("k", "t", "seq", "v")
    val tied = TemporalJoins.asofForward(l, r, Seq("k"), "t", Seq("v"), tieCol = Some("seq"))
      .collect()(0).getAs[String]("asof_v")
    assert(tied == "first")
  }

  test("asofNearest: closer side wins; equal distance breaks backward; one-sided falls through") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 16L), (1L, 30L), (2L, 5L), (3L, 50L))
      .toDF("k", "t")
    val r = Seq((1L, 8L, "b8"), (1L, 20L, "f20"), (2L, 9L, "f9")).toDF("k", "t", "v")
    val got = TemporalJoins.asofNearest(l, r, Seq("k"), "t", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString))).toSeq
    assert(got == Seq(
      (1L, 10L, Some("b8")),  // |10-8|=2 < |20-10|=10
      (1L, 16L, Some("f20")), // |16-8|=8 > |20-16|=4
      (1L, 30L, Some("f20")), // only backward side exists (20 <= 30)
      (2L, 5L, Some("f9")),   // only forward side exists
      (3L, 50L, None)))       // no right rows for key 3
    // equal distance: backward wins
    val mid = TemporalJoins.asofNearest(Seq((1L, 14L)).toDF("k", "t"), r,
        Seq("k"), "t", Seq("v")).collect()(0).getAs[String]("asof_v")
    assert(mid == "b8")
  }

  test("asofNearest plans one hash shuffle (both scans share the key partitioning)") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 8L, "x")).toDF("k", "t", "v")
    val df = TemporalJoins.asofNearest(l, r, Seq("k"), "t", Seq("v"))
    df.collect()
    // AQE prints the initial plan after the final one — count only the final
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val hashExchanges = "hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"nearest as-of is one union + one key shuffle:\n$p")
    assert("Window".r.findAllIn(p).length == 1,
      s"both directional frames should share one Window pass:\n$p")
  }

  test("pointInIntervalJoin equals naive inequality join") {
    import spark.implicits._
    val points = (0L until 200L by 3L).map(Tuple1(_)).toDF("p")
    val intervals = Seq((0L, 10L, "a"), (5L, 50L, "b"), (100L, 101L, "c"), (150L, 220L, "d"))
      .toDF("s", "e", "tag")
    val fast = TemporalJoins.pointInIntervalJoin(points, "p", intervals, "s", "e", 16L)
      .select("p", "tag")
    val naive = points.join(intervals, col("p") >= col("s") && col("p") < col("e"))
      .select("p", "tag")
    assert(rowsOf(fast) == rowsOf(naive))
    assert(fast.count() > 0)
  }

  test("pointInIntervalJoin: empty and exact-boundary semantics [start, end)") {
    import spark.implicits._
    val points = Seq(10L, 20L).map(Tuple1(_)).toDF("p")
    val intervals = Seq((10L, 20L, "x")).toDF("s", "e", "tag")
    val got = TemporalJoins.pointInIntervalJoin(points, "p", intervals, "s", "e", 4L)
      .select("p").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L)) // 10 in, 20 out (half-open)
  }

  test("a null-valued right row is matched WHOLE: null result, not an older row's value") {
    import spark.implicits._
    // right rows (t=10, v=5.0) and (t=19, v=null); left at t=20 with a
    // forward candidate (t=22, v=9.0). Independent per-column fills
    // would pair t=19's distance with t=10's value and answer 5.0; the
    // row-atomic struct fill must answer null (pandas merge_asof does)
    val l = Seq(("k", 20L)).toDF("k", "t")
    val r = Seq(("k", 10L, Option(5.0)), ("k", 19L, Option.empty[Double]),
      ("k", 22L, Option(9.0))).toDF("k", "t", "v")
    val nearest = TemporalJoins.asofNearest(l, r, Seq("k"), "t", Seq("v"))
      .select("asof_v").collect()(0)
    assert(nearest.isNullAt(0), s"nearest row (t=19) has a null v: got $nearest")
    val backward = TemporalJoins.asofBackward(l, r, Seq("k"), "t", Seq("v"))
      .select("asof_v").collect()(0)
    assert(backward.isNullAt(0), s"latest at-or-before row (t=19) has null v: got $backward")
  }
}
