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

  test("streamed stream-stream interval join == batch interval join") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.purchaseAttribution(EventStreams.readEventStream(spark, dir)),
      "interval_join_test", OutputMode.Append())
    val batch = EventStreams.purchaseAttribution(batchEvents)
    assert(rowsOf(streamed) == rowsOf(batch))
    assert(streamed.count() > 0, "attribution must produce pairs on testdata")
  }

  test("left-outer interval join keeps unattributed purchases with null view_id") {
    val outer = EventStreams.purchaseAttribution(batchEvents,
      "30 minutes", "left_outer")
    val inner = EventStreams.purchaseAttribution(batchEvents)
    val nPurchases = batchEvents.filter(col("event_type") === "purchase").count()
    // every purchase appears; the attributed subset equals the inner join
    assert(outer.select("purchase_id").distinct().count() == nPurchases)
    assert(rowsOf(outer.filter(col("view_id").isNotNull)) == rowsOf(inner))
    assert(outer.filter(col("view_id").isNull).count() > 0,
      "testdata must contain at least one purchase with no view in the lookback")
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

  test("watermark drops late data in append mode (the state-bounding contract)") {
    import org.apache.spark.sql.{Row, SaveMode}
    import java.nio.file.{Files, Paths}
    val ns = (h: Int, m: Int) =>
      java.time.LocalDateTime.of(2024, 1, 1, h, m).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    def mkFile(rows: Seq[(Long, Long)], stage: String, dir: String, n: Int): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t) =>
          Row(id, t, 1L, "click", 1.0, null) }, 1),
        EventStreams.eventSchema)
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$stage")
      val part = new java.io.File(s"$dir/$stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/f$n.parquet"))
    }
    val streamDir = Files.createTempDirectory("late_stream").toString
    // batch 1: two rows in window 10:00 + one at 12:00 (drives the
    // watermark to 11:50, past the 10:00 window's end)
    mkFile(Seq((1L, ns(10, 5)), (2L, ns(10, 15)), (3L, ns(12, 0))), "b1", streamDir, 1)

    val src = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema).parquet(streamDir))
    val q = EventStreams.tumblingCounts(src).writeStream
      .format("memory").queryName("late_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    q.processAllAvailable() // batch 1 done; watermark now 11:50
    // batch 2: a LATE row for the already-closed 10:00 window + a fresh one
    mkFile(Seq((4L, ns(10, 30)), (5L, ns(14, 0))), "b2", streamDir, 2)
    q.processAllAvailable()
    q.stop()
    val w10 = spark.table("late_test")
      .filter(col("window_start") === lit("2024-01-01 10:00:00").cast("timestamp"))
      .collect()
    assert(w10.length == 1, s"10:00 window must be emitted once, got ${w10.length}")
    assert(w10(0).getAs[Long]("n_events") == 2L,
      "late event must be DROPPED by the watermark (batch semantics would count 3)")
    // same pipeline in batch counts the late row — the semantic difference
    val batch = EventStreams.tumblingCounts(
      EventStreams.withEventTime(spark.read.schema(EventStreams.eventSchema).parquet(streamDir)))
      .filter(col("window_start") === lit("2024-01-01 10:00:00").cast("timestamp"))
      .collect()
    assert(batch(0).getAs[Long]("n_events") == 3L)
  }

  test("checkpoint restart: a second query resumes state, no loss or reprocessing") {
    import org.apache.spark.sql.{Row, SaveMode}
    import java.nio.file.{Files, Paths}
    val ns = (h: Int, m: Int) =>
      java.time.LocalDateTime.of(2024, 1, 2, h, m).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    def mkFile(rows: Seq[(Long, Long)], dir: String, n: Int): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t) =>
          Row(id, t, 1L, "click", 1.0, null) }, 1),
        EventStreams.eventSchema)
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/stage$n")
      val part = new java.io.File(s"$dir/stage$n").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/f$n.parquet"))
    }
    val streamDir = Files.createTempDirectory("ckpt_stream").toString
    val ckpt = Files.createTempDirectory("ckpt_loc").toString
    mkFile(Seq((1L, ns(10, 5)), (2L, ns(10, 15))), streamDir, 1)

    def startQuery(name: String) = {
      val src = EventStreams.withEventTime(
        spark.readStream.schema(EventStreams.eventSchema).parquet(streamDir))
      EventStreams.tumblingCounts(src).writeStream
        .format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
    }
    val q1 = startQuery("ckpt_a")
    q1.processAllAvailable(); q1.stop()
    // new data arrives while no query is running
    mkFile(Seq((3L, ns(10, 25)), (4L, ns(11, 5))), streamDir, 2)
    val q2 = startQuery("ckpt_b")
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("ckpt_b")
      .select(col("window_start").cast("string"), col("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // window 10:00 accumulated across the restart: 2 (before) + 1 (after)
    assert(got("2024-01-02 10:00:00") == 3L,
      s"state must survive the restart and merge new data: $got")
    assert(got("2024-01-02 11:00:00") == 1L)
  }

  test("customSessions: gap splits, duration cap splits, timeout emits the tail") {
    import org.apache.spark.sql.{Row, SaveMode}
    import java.nio.file.{Files, Paths}
    val ns = (h: Int, m: Int) =>
      java.time.LocalDateTime.of(2024, 1, 3, h, m).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    val us = (h: Int, m: Int) => ns(h, m) / 1000L
    def mkFile(rows: Seq[(Long, Long, Long)], dir: String, n: Int): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, u) =>
          Row(id, t, u, "click", 1.0, null) }, 1),
        EventStreams.eventSchema)
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/stage$n")
      val part = new java.io.File(s"$dir/stage$n").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/f$n.parquet"))
    }
    val streamDir = Files.createTempDirectory("sess_stream").toString
    // user 1: a burst 10:00-10:20 every 10m (one session under gap 30m),
    // then 12:00 (gap split). user 2: events every 20m from 10:00 to 12:00
    // — no 30m gap, but the 60m duration CAP must split it.
    mkFile(Seq(
      (1L, ns(10, 0), 1L), (2L, ns(10, 10), 1L), (3L, ns(10, 20), 1L),
      (4L, ns(12, 0), 1L),
      (5L, ns(10, 0), 2L), (6L, ns(10, 20), 2L), (7L, ns(10, 40), 2L),
      (8L, ns(11, 0), 2L), (9L, ns(11, 20), 2L), (10L, ns(11, 40), 2L),
      (11L, ns(12, 0), 2L)), streamDir, 1)

    def src = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema).parquet(streamDir))
    val q = EventStreams.customSessions(src, gapMinutes = 30, maxDurationMinutes = 60)
      .toDF().writeStream.format("memory").queryName("custom_sessions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable()
    // push the watermark far past every horizon so open tails time out
    mkFile(Seq((99L, ns(20, 0), 9L)), streamDir, 2)
    q.processAllAvailable()
    mkFile(Seq((100L, ns(21, 0), 9L)), streamDir, 3)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("custom_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // user 1: [10:00-10:20]×3 then [12:00]×1
    assert(got.contains((1L, us(10, 0), 3L)), s"user 1 burst session: $got")
    assert(got.contains((1L, us(12, 0), 1L)), s"user 1 gap-split session: $got")
    // user 2: duration cap at 60m splits despite no 30m inactivity:
    // [10:00..10:40]×3 (11:00 is exactly start+60m → force split), then [11:00..]
    assert(got.contains((2L, us(10, 0), 3L)), s"user 2 capped session: $got")
    assert(got.exists(s => s._1 == 2L && s._2 == us(11, 0)), s"user 2 second session: $got")
  }

  test("exactlyOnceParquetSink: redelivered batch id does not duplicate output") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("eo_sink").toString
    val sink = EventStreams.exactlyOnceParquetSink(out)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink(batch, 7L)
    sink(batch.union(batch), 7L) // redelivery with different content: must be a no-op
    val readBack = spark.read.parquet(s"$out/batch_7")
    assert(readBack.count() == 2, "first committed write wins; redelivery skipped")
    sink(batch, 8L) // a new batch id writes normally
    assert(spark.read.parquet(s"$out/batch_8").count() == 2)
    // end-to-end: stream the events file through the sink
    val dir = java.nio.file.Files.createTempDirectory("eo_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val out2 = java.nio.file.Files.createTempDirectory("eo_out").toString
    val q = EventStreams.readEventStream(spark, dir.toString)
      .writeStream.foreachBatch(EventStreams.exactlyOnceParquetSink(out2))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("eo_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val total = spark.read.parquet(s"$out2/batch_*").count()
    val source = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == source, s"all events exactly once: got $total of $source")
  }

  test("sliding windows: every event lands in window_length/slide windows") {
    val batch = EventStreams.slidingCounts(batchEvents)
    val total = batch.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == batchEvents.count() * 4) // 1h window / 15m slide
  }

  test("stream-static enrichment join == batch join; dim side broadcasts") {
    import spark.implicits._
    val dim = (0L to 9L).map(u => (u, s"tier_${u % 3}")).toDF("user_id", "tier")
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.enrichWithStatic(
          EventStreams.readEventStream(spark, dir), dim, Seq("user_id"))
        .select("event_id", "user_id", "tier"),
      "enrich_test", OutputMode.Append())
    val batch = EventStreams.enrichWithStatic(batchEvents, dim, Seq("user_id"))
      .select("event_id", "user_id", "tier")
    assert(rowsOf(streamed) == rowsOf(batch))
    assert(batch.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("windowedHeavyHitters: sketch state merges across micro-batches == batch sketch") {
    import spark.implicits._
    // two micro-batches hitting the SAME event-time window: the second
    // batch must fold into the stored MG buffer, not start fresh
    val base = 1700000000L * 1000000000L
    def evRow(id: Long, tp: String, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, id % 7, tp, 1.0, """{}""")
    val srcDir = java.nio.file.Files.createTempDirectory("hh_stream")
    def writeBatch(name: String, mtime: Long,
                   rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("hh_batch").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, srcDir.resolve(name))
      java.nio.file.Files.setLastModifiedTime(srcDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val b1 = (1L to 6L).map(i => evRow(i, "view", i)) ++ Seq(evRow(7L, "click", 10))
    val b2 = (8L to 10L).map(i => evRow(i, "view", 60 + i)) ++
      Seq(evRow(11L, "purchase", 80), evRow(12L, "click", 90))
    writeBatch("b1.parquet", 1000000, b1)
    writeBatch("b2.parquet", 2000000, b2)
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.windowedHeavyHitters(stream, "event_type", capacity = 8),
      "hh_test", OutputMode.Update())
    // update mode re-emits the window per batch; keep the LAST revision
    val last = streamed.collect().last.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    // capacity ≥ distinct items ⇒ the sketch holds exact counts
    assert(last == Seq(("view", 9L), ("click", 2L), ("purchase", 1L)), last.toString)
    val batch = EventStreams.windowedHeavyHitters(
      EventStreams.withEventTime(spark.read.parquet(srcDir.toString)), "event_type",
      capacity = 8)
    val batchLast = batch.collect()(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(last == batchLast, "stream state-merge must equal the batch sketch")
  }

  test("windowedDistinct: bitmap state merges across micro-batches == batch sketch") {
    import spark.implicits._
    // two micro-batches in the SAME window with OVERLAPPING user ids —
    // a fresh-start second batch would report 5, the folded state 7
    val base = 1700000000L * 1000000000L
    def evRow(id: Long, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, id % 7, "view", 1.0, """{}""")
    val srcDir = java.nio.file.Files.createTempDirectory("wd_stream")
    def writeBatch(name: String, mtime: Long,
                   rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("wd_batch").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, srcDir.resolve(name))
      java.nio.file.Files.setLastModifiedTime(srcDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    writeBatch("b1.parquet", 1000000, (1L to 7L).map(i => evRow(i, i))) // users 0..6
    writeBatch("b2.parquet", 2000000, (8L to 12L).map(i => evRow(i, 60 + i))) // users 1..5
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinct(stream, "user_id"),
      "wd_test", OutputMode.Update())
    val last = streamed.collect().last
    assert(last.getAs[Long]("n_distinct") == 7L,
      "batch 2 must fold into the stored bitmap, not start fresh")
    val batch = EventStreams.windowedDistinct(
      EventStreams.withEventTime(spark.read.parquet(srcDir.toString)), "user_id")
      .collect()(0)
    assert(batch.getAs[Long]("n_distinct") == 7L)
    // deterministic wire format: streamed final state == batch sketch bytes
    assert(java.util.Arrays.equals(
      last.getAs[Array[Byte]]("sketch"), batch.getAs[Array[Byte]]("sketch")),
      "stream state-merge must serialize identically to the batch sketch")
  }

  test("windowedQuantiles: DDSketch state merges across micro-batches == batch sketch") {
    import spark.implicits._
    val base = 1700000000L * 1000000000L
    def evRow(id: Long, value: Double, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, id % 7, "view", value, """{}""")
    val srcDir = java.nio.file.Files.createTempDirectory("wq_stream")
    def writeBatch(name: String, mtime: Long,
                   rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("wq_batch").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, srcDir.resolve(name))
      java.nio.file.Files.setLastModifiedTime(srcDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // values 1..100 split across two micro-batches of the same window:
    // a fresh-start batch 2 would report p50 of 51..100 (~75), folded ~50
    writeBatch("b1.parquet", 1000000, (1L to 50L).map(i => evRow(i, i.toDouble, i % 50)))
    writeBatch("b2.parquet", 2000000, (51L to 100L).map(i => evRow(i, i.toDouble, i % 50)))
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.windowedQuantiles(stream, "value"),
      "wq_test", OutputMode.Update())
    val last = streamed.collect().last
    assert(math.abs(last.getAs[Double]("p50") / 50.0 - 1) < 0.05,
      s"p50 over the folded window should be ~50, got ${last.getAs[Double]("p50")}")
    val batch = EventStreams.windowedQuantiles(
      EventStreams.withEventTime(spark.read.parquet(srcDir.toString)), "value")
      .collect()(0)
    assert(last.getAs[Double]("p50") == batch.getAs[Double]("p50"))
    assert(java.util.Arrays.equals(
      last.getAs[Array[Byte]]("sketch"), batch.getAs[Array[Byte]]("sketch")),
      "stream state-merge must serialize identically to the batch sketch")
  }

  test("windowedDistinctApprox: KMV state folds across micro-batches == batch sketch") {
    import spark.implicits._
    // same overlapping-user shape as the bitmap test: 7 distinct users
    // split over two micro-batches with overlap — fresh-start batch 2
    // would answer 5; below k the KMV estimate is EXACT, so folded
    // state must answer 7.0
    val base = 1700000000L * 1000000000L
    def evRow(id: Long, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, id % 7, "view", 1.0, """{}""")
    val srcDir = java.nio.file.Files.createTempDirectory("wk_stream")
    def writeBatch(name: String, mtime: Long,
                   rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("wk_batch").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, srcDir.resolve(name))
      java.nio.file.Files.setLastModifiedTime(srcDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    writeBatch("b1.parquet", 1000000, (1L to 7L).map(i => evRow(i, i)))
    writeBatch("b2.parquet", 2000000, (8L to 12L).map(i => evRow(i, 60 + i)))
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.windowedDistinctApprox(stream, "user_id", k = 64),
      "wk_test", OutputMode.Update())
    val last = streamed.collect().last
    assert(last.getAs[Double]("approx_distinct") == 7.0,
      "below k the folded KMV window must be exact")
    val batch = EventStreams.windowedDistinctApprox(
      EventStreams.withEventTime(spark.read.parquet(srcDir.toString)),
      "user_id", k = 64).collect()(0)
    assert(java.util.Arrays.equals(
      last.getAs[Array[Byte]]("sketch"), batch.getAs[Array[Byte]]("sketch")),
      "stream state-merge must serialize identically to the batch sketch")
  }

  test("dedupWithinWatermark drops duplicate keys across micro-batches") {
    import spark.implicits._
    // two files = two micro-batches (maxFilesPerTrigger=1); the batch-2
    // duplicate of user 1 must be dropped by state retained from batch 1
    val base = 1700000000L * 1000000000L // epoch ns
    def evRow(id: Long, user: Long, offsetSec: Long) =
      (id, base + offsetSec * 1000000000L, user, "view", 1.0, """{}""")
    val srcDir = java.nio.file.Files.createTempDirectory("dedup_stream")
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("dedup_batch").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, srcDir.resolve(name))
    }
    writeBatch("b1.parquet", Seq(evRow(1L, 1L, 0), evRow(2L, 2L, 60)))
    writeBatch("b2.parquet", Seq(evRow(3L, 1L, 120), evRow(4L, 3L, 180)))
    // order the file source by name: set mod times explicitly
    java.nio.file.Files.setLastModifiedTime(srcDir.resolve("b1.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000))
    java.nio.file.Files.setLastModifiedTime(srcDir.resolve("b2.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(2000000))
    val stream = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
    val deduped = EventStreams.runToMemory(spark,
      EventStreams.dedupWithinWatermark(stream, Seq("user_id"), "10 minutes")
        .select("event_id", "user_id"),
      "dedup_test", OutputMode.Append())
    val got = deduped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // event 3 (user 1 again, 2 min later — inside the 10 min delay) is dropped
    assert(got == Set((1L, 1L), (2L, 2L), (4L, 3L)), s"got $got")
  }
}
