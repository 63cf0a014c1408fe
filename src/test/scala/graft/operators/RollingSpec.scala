package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {

  // epoch-second timestamps make the expected frames easy to read
  private def events = {
    import spark.implicits._
    Seq(
      (1L, "u1", 1000L, 10.0),
      (2L, "u1", 1030L, 20.0),
      (3L, "u1", 1059L, 30.0), // still within 60s of event 1
      (4L, "u1", 1060L, 40.0), // 60s window [1001, 1060]: drops event 1
      (5L, "u1", 5000L, 50.0), // isolated
      (6L, "u2", 1030L, 7.0)   // other key: never mixes
    ).toDF("event_id", "user", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
  }

  test("trailing window counts exactly the key's events in [t-w+1, t]") {
    val got = Rolling.trailingAgg(events, "user", "ts", "value", 60)
      .orderBy("event_id")
      .select("event_id", "roll_count", "roll_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 10.0), (2L, 2L, 30.0), (3L, 3L, 60.0),
      (4L, 3L, 90.0), (5L, 1L, 50.0), (6L, 1L, 7.0)))
  }

  test("equal-timestamp events are frame peers — each sees the other") {
    import spark.implicits._
    val ties = Seq((1L, "u", 100L, 1.0), (2L, "u", 100L, 2.0))
      .toDF("event_id", "user", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Rolling.trailingAgg(ties, "user", "ts", "value", 10)
      .select("event_id", "roll_count", "roll_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 3.0), (2L, 2L, 3.0)))
  }

  test("null values: counted by roll_count, ignored by sum/avg") {
    import spark.implicits._
    val df = Seq((1L, "u", 100L, Some(4.0)), (2L, "u", 105L, None))
      .toDF("event_id", "user", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Rolling.trailingAgg(df, "user", "ts", "value", 60)
      .filter(col("event_id") === 2L).collect()(0)
    assert(r.getAs[Long]("roll_count") == 2L)
    assert(r.getAs[Double]("roll_sum") == 4.0)
    assert(r.getAs[Double]("roll_avg") == 4.0)
  }

  test("plan: one exchange on the key, no self-join") {
    val plan = Rolling.trailingAgg(events, "user", "ts", "value", 60)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"rolling agg must not plan a join:\n$plan")
  }

  test("rejects a non-positive window") {
    intercept[IllegalArgumentException] {
      Rolling.trailingAgg(events, "user", "ts", "value", 0)
    }
  }

  test("resample densifies gaps with zero counts and forward-fills the sum") {
    import spark.implicits._
    // u1: buckets 0 and 3 occupied (gap at 1, 2); u2: single bucket
    val ev = Seq(
      ("u1", 10L, 1.0), ("u1", 50L, 2.0),  // bucket 0: n=2, sum=3.0
      ("u1", 190L, 5.0),                   // bucket 3: n=1, sum=5.0
      ("u2", 70L, 9.0)                     // bucket 1: n=1, sum=9.0
    ).toDF("user", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Rolling.resample(ev, "user", "ts", "value", bucketSeconds = 60L)
      .orderBy("user", "bucket_start")
      .select("user", "bucket_start", "n_events", "sum_value", "filled_sum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("u1", 0L, 2L, Some(3.0), Some(3.0)),
      ("u1", 60L, 0L, None, Some(3.0)),    // gap: zero count, carried sum
      ("u1", 120L, 0L, None, Some(3.0)),
      ("u1", 180L, 1L, Some(5.0), Some(5.0)),
      ("u2", 60L, 1L, Some(9.0), Some(9.0))))
  }

  test("resample: null timestamps are excluded up front, not silently half-counted") {
    import spark.implicits._
    val ev = Seq((Option(10L), 1.0), (Option.empty[Long], 99.0), (Option(70L), 2.0))
      .toDF("sec", "value")
      .withColumn("user", lit("u1"))
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Rolling.resample(ev, "user", "ts", "value", bucketSeconds = 60L)
      .orderBy("bucket_start")
      .select("bucket_start", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the null-ts row contributes to NO bucket; both real buckets intact
    assert(got.toSeq == Seq((0L, 1L, 1.0), (60L, 1L, 2.0)))
  }

  test("resample: the per-key span guard raises instead of exploding") {
    import spark.implicits._
    val ev = Seq(("u1", 0L, 1.0), ("u1", 600L, 1.0))
      .toDF("user", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val err = intercept[Exception] {
      Rolling.resample(ev, "user", "ts", "value",
        bucketSeconds = 60L, maxBucketsPerKey = 5L).collect()
    }
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("|")
    assert(messages.contains("resample"),
      s"expected the resample guard, got: $messages")
  }

  test("ewma: hand-computed recurrence per key; reset between keys; null values drop") {
    import spark.implicits._
    // key a: x = 10, 20, 30 at α=0.5 → s = 10, 15, 22.5
    // key b: single row → s = its own value (state must reset)
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)),
      ("a", 3L, Some(30.0)), ("a", 4L, None), ("b", 1L, Some(7.0)))
      .toDF("k", "t", "v")
    val r = Rolling.ewma(df, "k", Seq("t"), "v", alpha = 0.5)
      .orderBy("key", "t").collect()
    assert(r.length == 4, "the null-value row must drop")
    assert(r.map(_.getAs[Double]("ewma")).toSeq == Seq(10.0, 15.0, 22.5, 7.0))
    assert(r(3).getAs[String]("key") == "b")
    graft.Caches.unpersistAll()
  }

  test("ewma: result is independent of input row order and partitioning") {
    import spark.implicits._
    val rows = (1 to 200).map(i => ((i % 3).toString, i.toLong, (i * 7 % 13).toDouble))
    val sorted = rows.toDF("k", "t", "v")
    val shuffled = scala.util.Random.shuffle(rows).toDF("k", "t", "v").repartition(7)
    val a = Rolling.ewma(sorted, "k", Seq("t"), "v", 0.2)
      .orderBy("key", "t").collect().map(_.getAs[Double]("ewma")).toSeq
    val b = Rolling.ewma(shuffled, "k", Seq("t"), "v", 0.2)
      .orderBy("key", "t").collect().map(_.getAs[Double]("ewma")).toSeq
    assert(a == b, "fold must be a pure function of (key, order), not physical layout")
    graft.Caches.unpersistAll()
  }
}
