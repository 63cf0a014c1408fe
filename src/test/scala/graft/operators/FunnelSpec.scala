package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user", "sec", "tp").withColumn("ts", timestamp_seconds(col("sec")))
  }

  private def run(rows: Seq[(Long, Long, String)], steps: Seq[String]) =
    Funnel.conversionFunnel(ev(rows), "user", "ts", "tp", steps)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

  test("counts are cumulative-by-stage and order-sensitive") {
    val got = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"), // full chain
      (2L, 10L, "view"), (2L, 20L, "click"),                   // stops at 2
      (3L, 20L, "click"), (3L, 30L, "view"),                   // click BEFORE view: stage 1 only
      (4L, 10L, "buy")                                         // never starts
    ), Seq("view", "click", "buy"))
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)))
  }

  test("greedy earliest-first matching never forecloses a later step") {
    // the FIRST click (t=20) is before the only buy (t=25); a non-greedy
    // matcher that picked the t=40 click would miss the buy — greedy
    // takes t=20 and converts
    val got = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 25L, "buy"), (1L, 40L, "click")
    ), Seq("view", "click", "buy"))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("equal timestamps do not advance a stage (strictly-later semantics)") {
    val got = run(Seq(
      (1L, 10L, "view"), (1L, 10L, "click"), // same second: no advance
      (2L, 10L, "view"), (2L, 11L, "click")
    ), Seq("view", "click"))
    assert(got.toSeq == Seq((1, "view", 2L), (2, "click", 1L)))
  }

  test("repeated step types only advance once per stage") {
    val got = run(Seq(
      (1L, 10L, "view"), (1L, 11L, "view"), (1L, 12L, "view")
    ), Seq("view", "view", "view"))
    // view@10 -> stage1, view@11 -> stage2, view@12 -> stage3
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("plan: one exchange for the per-user fold, no per-step self-join") {
    val df = Funnel.conversionFunnel(ev(Seq((1L, 10L, "view"))),
      "user", "ts", "tp", Seq("view", "click"))
    val plan = df.queryExecution.executedPlan.toString
    // the only join allowed is the broadcast of the step SPINE (bounded
    // by |steps|); a k-way per-step self-join would shuffle events k
    // times — assert the event table still moves exactly once
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"funnel must not shuffle-join:\n$plan")
    // user fold + the |steps|-sized count aggregate — a per-step join
    // would add one per stage
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <= 2 hash exchanges:\n$plan")
  }

  test("a zero-conversion stage still emits its row (one row PER STAGE)") {
    import spark.implicits._
    val events = Seq((1L, 10L, "view"), (1L, 20L, "click"), (2L, 5L, "view"))
      .toDF("user", "ts", "tp")
    val got = Funnel.conversionFunnel(events, "user", "ts", "tp",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // nobody purchases — the stage must appear with 0, not vanish
    assert(got.toSeq == Seq((1, "view", 2L), (2, "click", 1L), (3, "purchase", 0L)))
  }

  test("a user within maxEventsPerUser converts normally (cap is not a filter)") {
    val got = Funnel.conversionFunnel(
        ev(Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"))),
        "user", "ts", "tp", Seq("view", "click", "buy"), maxEventsPerUser = 3)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L), (2, 1L), (3, 1L)))
  }

  test("a user over maxEventsPerUser raises loudly, never a silent OOM risk") {
    val rows = (1L to 10L).map(s => (7L, s, "view"))
    val ex = intercept[Exception] {
      Funnel.conversionFunnel(ev(rows), "user", "ts", "tp",
        Seq("view", "click"), maxEventsPerUser = 5).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxEventsPerUser") && msg.contains("7"),
      s"expected the named guard with the offending user, got: $msg")
  }

  test("only step-type events count against the cap (the filter runs first)") {
    // 10 'noise' events never reach the fold — a cap of 3 must not trip
    val rows = (1L to 10L).map(s => (1L, s, "noise")) ++
      Seq((1L, 11L, "view"), (1L, 12L, "click"))
    val got = Funnel.conversionFunnel(ev(rows), "user", "ts", "tp",
        Seq("view", "click"), maxEventsPerUser = 3)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L), (2, 1L)))
  }

  test("transitionMatrix: consecutive pairs per key, rows normalize to 1") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),  // A->B, B->A
      (2L, 1L, "A"), (2L, 2L, "A")                  // A->A
    ).toDF("user", "ts", "tp").withColumn("id", monotonically_increasing_id())
    val got = Funnel.transitionMatrix(events, "user", "ts", "tp", "id")
      .orderBy("from_state", "to_state")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 1L, 1.0)))
  }

  test("transitionMatrix: same-timestamp events order by the tie-break column") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, 1L, "X"), (1L, 10L, 2L, "Y"), (1L, 10L, 3L, "Z"))
      .toDF("user", "ts", "id", "tp")
    val got = Funnel.transitionMatrix(events, "user", "ts", "tp", "id")
      .orderBy("from_state")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("X", "Y"), ("Y", "Z")))
  }

  test("transitionMatrix: a single-event key contributes no transitions") {
    import spark.implicits._
    val events = Seq((1L, 10L, 1L, "A")).toDF("user", "ts", "id", "tp")
    assert(Funnel.transitionMatrix(events, "user", "ts", "tp", "id").count() == 0)
  }

  test("stateHighWater measures the per-user step-event distribution the funnel collects") {
    import spark.implicits._
    // user 1: 3 step events (+1 non-step, excluded); user 2: 1; user 3: 0 steps
    val events = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"), (1L, 4L, "scroll"),
      (2L, 1L, "view"),
      (3L, 1L, "scroll"))
      .toDF("user", "ts", "tp")
    val hw = Funnel.stateHighWater(events, "user", "tp",
      Seq("view", "click", "purchase")).head()
    assert(hw.getAs[Long]("n_users") == 2, "step-less users never enter the funnel state")
    assert(hw.getAs[Long]("max_events_per_user") == 3)
    assert(hw.getAs[Double]("mean_events_per_user") == 2.0)
    assert(hw.getAs[Double]("p99_events_per_user") == 3.0)
  }

  private def pathsOf(rows: Seq[(Long, Long, Long, String)], gapNs: Long,
                      topK: Int = 20): Seq[(String, Long)] = {
    import spark.implicits._
    Funnel.sessionPaths(rows.toDF("user", "ts", "eid", "tp"),
        "user", "ts", "tp", "eid", gapNs, topK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("sessionPaths: gap splits sessions, exact paths, counts aggregate across users") {
    val min = 60L * 1000000000L
    val rows = Seq(
      // user 1: view>click, 40-min gap, view>click again
      (1L, 0 * min, 1L, "view"), (1L, 1 * min, 2L, "click"),
      (1L, 41 * min, 3L, "view"), (1L, 42 * min, 4L, "click"),
      // user 2: one session view>click
      (2L, 0 * min, 5L, "view"), (2L, 5 * min, 6L, "click"),
      // user 3: solo purchase
      (3L, 0 * min, 7L, "purchase"))
    assert(pathsOf(rows, gapNs = 30 * min) ==
      Seq(("view>click", 3L), ("purchase", 1L)))
  }

  test("sessionPaths: equal timestamps order by the tie-break column") {
    val rows = Seq(
      (1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"), (1L, 100L, 3L, "c"))
    assert(pathsOf(rows, gapNs = 1000L) == Seq(("a>b>c", 1L)))
  }

  test("sessionPaths: a gap equal to the threshold does NOT split (strict >)") {
    val rows = Seq((1L, 0L, 1L, "x"), (1L, 500L, 2L, "y"), (1L, 1001L, 3L, "z"))
    // 0→500 gap 500 ≤ 500 keeps; 500→1001 gap 501 > 500 splits
    assert(pathsOf(rows, gapNs = 500L).toSet == Set(("x>y", 1L), ("z", 1L)))
  }

  test("conversionLag: greedy-earliest chain times, exact percentiles, non-converters excluded") {
    import spark.implicits._
    val us = 1000L // ns per µs
    val rows = Seq(
      // u1 converts: view@0, click@10µs, purchase@30µs → lag 30
      (1L, 0L, "view"), (1L, 10 * us, "click"), (1L, 30 * us, "purchase"),
      // u2 converts: view@0 (an earlier purchase@-5 must NOT count),
      // click@20µs, purchase@50µs → lag 50
      (2L, -5 * us, "purchase"), (2L, 0L, "view"), (2L, 20 * us, "click"),
      (2L, 50 * us, "purchase"),
      // u3: view then purchase BEFORE click — no chain
      (3L, 0L, "view"), (3L, 5 * us, "purchase"), (3L, 9 * us, "click"))
      .toDF("user", "ts", "tp")
    val r = Funnel.conversionLag(rows, "user", "ts", "tp",
      Seq("view", "click", "purchase")).head()
    assert(r.getAs[Long]("n_converters") == 2L)
    assert(r.getAs[Double]("p50_us") == 40.0, "exact interpolation between 30 and 50")
    assert(r.getAs[Double]("p90_us") == 48.0)
    assert(r.getAs[Long]("max_us") == 50L)
  }

  test("sessionPaths: topK caps with count-then-path ordering") {
    val rows = Seq(
      (1L, 0L, 1L, "a"), (2L, 0L, 2L, "a"),
      (3L, 0L, 3L, "b"), (4L, 0L, 4L, "c"))
    assert(pathsOf(rows, gapNs = 10L, topK = 2) == Seq(("a", 2L), ("b", 1L)))
  }

  test("abTestGate: hand-computed pooled z; unit-level conversion, not event-level") {
    import spark.implicits._
    // variant 0: users 0,2 (user 0 converts — twice, must count once);
    // variant 1: users 1,3 (none convert)
    val ev = Seq(
      (0L, 0L, "purchase"), (0L, 0L, "purchase"), (0L, 0L, "view"),
      (2L, 0L, "view"),
      (1L, 1L, "view"), (3L, 1L, "click")
    ).toDF("user_id", "variant", "event_type")
    val r = Funnel.abTestGate(ev, "user_id", "variant", "event_type", "purchase")
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("conv_a") == 1 && r.getAs[Long]("conv_b") == 0)
    val pool = 0.25
    val z = (0.5 - 0.0) / math.sqrt(pool * (1 - pool) * (1.0 / 2 + 1.0 / 2))
    assert(r.getAs[Double]("z") == z)
    assert(!r.getAs[Boolean]("significant"), s"z=$z is under 1.96")
  }

  test("rfmTable: hand-computed recency/frequency/monetary; fitted quintiles rank correctly") {
    import spark.implicits._
    val tx = Seq(
      (1L, "2024-01-10", 10.00), (1L, "2024-03-01", 5.50),   // recent, 2 orders
      (2L, "2023-06-15", 100.00),                            // stale whale
      (3L, "2024-02-20", 1.25), (3L, "2024-02-21", 1.25), (3L, "2024-02-22", 1.25)
    ).toDF("cust", "d", "amt")
    val got = Funnel.rfmTable(tx, "cust", "d", "amt", anchorDate = "2024-03-31")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
         r.getAs[Double]("monetary"), r.getAs[Long]("r_score"),
         r.getAs[Long]("m_score"))).toMap
    assert(got(1L)._1 == 30 && got(1L)._2 == 2 && got(1L)._3 == 15.50)
    assert(got(2L)._1 == 290 && got(2L)._3 == 100.00)
    assert(got(3L)._1 == 38 && got(3L)._2 == 3 && got(3L)._3 == 3.75)
    // ordering properties, not absolute bins: most recent ≥ stalest,
    // whale ≥ everyone on monetary
    assert(got(1L)._4 >= got(2L)._4, "fresher customer can't score lower on recency")
    assert(got(2L)._5 >= got(1L)._5 && got(2L)._5 >= got(3L)._5)
  }

  test("abTestGate: more than two variants fails loudly") {
    import spark.implicits._
    val ev = Seq((0L, 0L, "view"), (1L, 1L, "view"), (2L, 2L, "view"))
      .toDF("user_id", "variant", "event_type")
    val ex = intercept[Exception] {
      Funnel.abTestGate(ev, "user_id", "variant", "event_type", "purchase").collect()
    }
    assert(ex.getMessage != null)
  }
}
