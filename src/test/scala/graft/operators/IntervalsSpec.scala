package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {

  private def iv(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "s", "e")
  }

  test("coalesce merges overlaps, keeps disjoint spans, counts members") {
    val got = Intervals.coalesce(
        iv(Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 30L))),
        Seq("k"), "s", "e")
      .orderBy("span_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 0L, 15L, 2L), ("a", 20L, 30L, 1L)))
  }

  test("containment: a long interval swallows later short ones (running max, not lag)") {
    // lag(end) instead of running max(end) gets this wrong: [10,20]'s
    // predecessor end 100 covers [30,40] too
    val got = Intervals.coalesce(
        iv(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L), ("a", 150L, 160L))),
        Seq("k"), "s", "e")
      .orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 100L, 3L), (150L, 160L, 1L)))
  }

  test("touching endpoints merge by default, stay separate under strict") {
    val touching = iv(Seq(("a", 0L, 10L), ("a", 10L, 20L)))
    val merged = Intervals.coalesce(touching, Seq("k"), "s", "e").collect()
    assert(merged.length == 1)
    val strict = Intervals.coalesce(touching, Seq("k"), "s", "e", strict = true)
      .orderBy("span_start").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(strict.toSeq == Seq((0L, 10L), (10L, 20L)))
  }

  test("keys never mix") {
    val got = Intervals.coalesce(
        iv(Seq(("a", 0L, 10L), ("b", 5L, 15L))), Seq("k"), "s", "e")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 0L, 10L), ("b", 5L, 15L)))
  }

  test("gaps are the strict complement between merged spans") {
    val got = Intervals.gaps(
        iv(Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 30L), ("a", 50L, 60L))),
        Seq("k"), "s", "e")
      .orderBy("gap_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((15L, 20L), (30L, 50L)))
  }

  test("a null endpoint raises instead of silently mis-merging the key's islands") {
    import spark.implicits._
    val bad = Seq(("a", Some(0L), Some(10L)), ("a", Some(5L), Option.empty[Long]))
      .toDF("k", "s", "e")
    val err = intercept[Exception] {
      Intervals.coalesce(bad, Seq("k"), "s", "e").collect()
    }
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("|")
    assert(messages.contains("coalesce"), s"expected the null guard, got: $messages")
  }

  test("plan: one exchange — windows and the island aggregate share the key partitioning") {
    val df = Intervals.coalesce(
      iv(Seq(("a", 0L, 10L), ("a", 5L, 15L))), Seq("k"), "s", "e")
    // pre-execution plan: the executed AQE string would render the
    // Exchange twice (final + initial sections)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"coalesce must not plan a join:\n$plan")
  }
}
