package graft.sources

import graft.SparkSpec
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events table's `ts` has shipped with two physical parquet encodings
  * across driver testdata generations: TIMESTAMP(NANOS) — which Spark reads
  * as raw epoch-ns Long under spark.sql.legacy.parquet.nanosAsLong — and
  * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ (pandas writes
  * isAdjustedToUTC=false) or TIMESTAMP. A re-type of the on-disk data must
  * be absorbed by `Tables.withEventTime`, not fatal to every event-time
  * operator: this spec writes the SAME logical rows in all three readable
  * encodings and asserts the canonical output (`ts` epoch-ns Long +
  * `event_time` TimestampType) and the downstream window/funnel/stream
  * results are identical.
  */
class EventTimeEncodingSpec extends SparkSpec {

  // one hour of events: 2 users, 4 types, µs-precision timestamps
  private val baseUs: Long = java.time.LocalDateTime
    .of(2024, 3, 1, 9, 0, 0)
    .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
  private val rowsUs: Seq[(Long, Long, Long, String, Double)] =
    (0 until 200).map { i =>
      (i.toLong, baseUs + i * 37L * 1000000L + i * 13L, // not second-aligned
        (i % 2).toLong, Seq("view", "click", "purchase", "error")(i % 4),
        i * 0.25)
    }

  private def writeLongNs(dir: String): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rowsUs.map { case (id, us, u, ty, v) =>
        Row(id, us * 1000L, u, ty, v, null) }, 2), schema)
    df.write.mode(SaveMode.Overwrite).parquet(dir)
  }

  private def writeTimestamp(dir: String, ntz: Boolean): Unit = {
    val tsType = if (ntz) TimestampNTZType else TimestampType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rowsUs.map { case (id, us, u, ty, v) =>
        val t: Any =
          if (ntz) java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
          else java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
        Row(id, t, u, ty, v, null) }, 2), schema)
    df.write.mode(SaveMode.Overwrite).parquet(dir)
  }

  private lazy val dirs: Map[String, String] = {
    val root = java.nio.file.Files.createTempDirectory("events_enc")
    val longDir = s"$root/long_ns"
    val ltzDir = s"$root/ts_ltz"
    val ntzDir = s"$root/ts_ntz"
    writeLongNs(longDir)
    writeTimestamp(ltzDir, ntz = false)
    writeTimestamp(ntzDir, ntz = true)
    Map("long_ns" -> longDir, "ts_ltz" -> ltzDir, "ts_ntz" -> ntzDir)
  }

  private def canon(dir: String): DataFrame =
    Tables.withEventTime(spark.read.parquet(dir))

  test("three physical encodings read back as three distinct Spark types") {
    assert(spark.read.parquet(dirs("long_ns")).schema("ts").dataType == LongType)
    assert(spark.read.parquet(dirs("ts_ltz")).schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(dirs("ts_ntz")).schema("ts").dataType == TimestampNTZType)
  }

  test("withEventTime canonicalizes every encoding to ns-Long ts + TimestampType event_time") {
    val results = dirs.map { case (name, d) =>
      val c = canon(d)
      assert(c.schema("ts").dataType == LongType, s"$name: ts must be ns-Long")
      assert(c.schema("event_time").dataType == TimestampType,
        s"$name: event_time must be TimestampType")
      name -> rowsOf(c.select(col("event_id"), col("ts"),
        col("event_time").cast("string")))
    }
    assert(results("long_ns") == results("ts_ltz"))
    assert(results("long_ns") == results("ts_ntz"))
  }

  test("withEventTime rejects an unreadable ts type") {
    val bad = spark.range(3).withColumn("ts", col("id").cast("string"))
    intercept[IllegalArgumentException](Tables.withEventTime(bad))
  }

  test("q33-shaped tumbling window identical across encodings") {
    val res = dirs.view.mapValues { d =>
      rowsOf(EventStreams.tumblingCounts(canon(d))
        .select(col("window_start").cast("string"), col("event_type"),
          col("n_events"), round(col("sum_value"), 4)))
    }.toMap
    assert(res("long_ns").nonEmpty)
    assert(res("long_ns") == res("ts_ltz"))
    assert(res("long_ns") == res("ts_ntz"))
  }

  test("q84-shaped funnel identical across encodings") {
    val steps = Seq("view", "click", "purchase")
    val res = dirs.view.mapValues { d =>
      rowsOf(graft.operators.Funnel.conversionFunnel(canon(d), "user_id",
        "ts", "event_type", steps))
    }.toMap
    assert(res("long_ns").nonEmpty)
    assert(res("long_ns") == res("ts_ltz"))
    assert(res("long_ns") == res("ts_ntz"))
  }

  test("streaming file source reads the footer's actual encoding (both ways)") {
    val streamed = Seq("long_ns", "ts_ntz").map { name =>
      val out = EventStreams.runToMemory(spark,
        EventStreams.tumblingCounts(EventStreams.readEventStream(spark, dirs(name))),
        s"enc_stream_$name")
      name -> rowsOf(out.select(col("window_start").cast("string"),
        col("event_type"), col("n_events"), round(col("sum_value"), 4)))
    }.toMap
    assert(streamed("long_ns").nonEmpty)
    assert(streamed("long_ns") == streamed("ts_ntz"))
  }
}
