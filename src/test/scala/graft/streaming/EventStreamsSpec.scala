package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming specs — the load-bearing property is batch/stream unification:
  * each transform streamed over a bounded file source must equal the same
  * transform run as a plain batch query.
  */
class EventStreamsSpec extends SparkSpec {

  /** File streams watch directories; testdata ships single files — stage
    * the events file into a temp dir once for the whole spec.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def batchEvents = EventStreams.withEventTime(
    spark.read.parquet(s"$dir/events.parquet"))

  test("streamed tumbling counts == batch tumbling counts") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.tumblingCounts(EventStreams.readEventStream(spark, dir)),
      "tumble_test")
    val batch = EventStreams.tumblingCounts(batchEvents)
    assert(rowsOf(streamed) == rowsOf(batch))
    assert(streamed.count() > 0)
  }

  test("streamed session windows == batch session windows") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.sessionCounts(EventStreams.readEventStream(spark, dir)),
      "session_test")
    val batch = EventStreams.sessionCounts(batchEvents)
    assert(rowsOf(streamed) == rowsOf(batch))
  }

  test("stateful per-user aggregation (mapGroupsWithState) in update mode") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.statefulUserAgg(EventStreams.readEventStream(spark, dir)),
      "stateful_test", OutputMode.Update())
    // final state per user must match a plain batch groupBy
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("nEvents"), max("value").as("maxValue"))
    // memory sink in update mode appends state revisions; keep the last per user
    val lastState = streamed.groupBy("userId")
      .agg(max("nEvents").as("nEvents"), max("maxValue").as("maxValue"))
    assert(rowsOf(lastState.select(col("userId"), col("nEvents"))) ==
      rowsOf(batch.select(col("user_id"), col("nEvents"))))
  }

  test("sliding windows: every event lands in window_length/slide windows") {
    val batch = EventStreams.slidingCounts(batchEvents)
    val total = batch.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == batchEvents.count() * 4) // 1h window / 15m slide
  }
}
