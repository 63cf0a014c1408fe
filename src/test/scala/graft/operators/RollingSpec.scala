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
}
