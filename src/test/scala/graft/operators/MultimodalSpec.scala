package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthesize produces the canonical media schema") {
    val media = Multimodal.synthesize(spark, 30)
    assert(media.columns.toSeq ==
      Seq("media_id", "modality", "width", "height", "n_frames", "payload"))
    assert(media.count() == 30)
    assert(media.select("modality").distinct().count() == 3)
  }

  test("decode stub round-trips the header metadata exactly") {
    val media = Multimodal.synthesize(spark, 30)
    val decoded = Multimodal.decodeFeatures(media, frameStride = 2).toDF()
    val joined = media.join(decoded,
      media("media_id") === decoded("mediaId") &&
        media("width") === decoded("decodedWidth") &&
        media("height") === decoded("decodedHeight") &&
        media("modality") === decoded("modality"))
    assert(joined.count() == 30, "every decoded row must match its source metadata")
  }

  test("features are deterministic and fixed-dimension") {
    val media = Multimodal.synthesize(spark, 10)
    val a = Multimodal.decodeFeatures(media).collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    val b = Multimodal.decodeFeatures(media).collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.size == 16))
  }

  test("frame sampling respects stride") {
    val media = Multimodal.synthesize(spark, 30).filter(col("modality") === "video")
    val d1 = Multimodal.decodeFeatures(media, frameStride = 1).collect()
    val d4 = Multimodal.decodeFeatures(media, frameStride = 4).collect()
    val f1 = d1.map(f => f.mediaId -> f.nFramesSampled).toMap
    val f4 = d4.map(f => f.mediaId -> f.nFramesSampled).toMap
    assert(f1.forall { case (id, n) => n >= f4(id) })
    assert(f4.values.forall(_ >= 1))
  }

  test("decodeBmp really parses the format: hand-built 2x2 bottom-up BMP with row padding") {
    // 2x2 @ 24bpp: rowSize = 8 (6 pixel bytes + 2 padding). Logical
    // top-down pixel bytes are 10..60 (row 0) and 70..120 (row 1); the
    // file stores row 1 FIRST (bottom-up) with 0xEE padding. A decoder
    // that ignores bottom-up order reads lane 0 as 70; one that ignores
    // padding shifts every row-1 byte by two.
    val buf = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(70).putInt(0).putInt(54)
      .putInt(40).putInt(2).putInt(2)
      .putShort(1).putShort(24).putInt(0)
      .putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    Seq(70, 80, 90, 100, 110, 120, 0xEE, 0xEE, // stored first = logical row 1
        10, 20, 30, 40, 50, 60, 0xEE, 0xEE)    // stored last  = logical row 0
      .foreach(b => buf.put(b.toByte))
    val f = Multimodal.decodeBmp(42L, buf.array())
    assert(f.mediaId == 42L && f.modality == "image")
    assert(f.decodedWidth == 2 && f.decodedHeight == 2 && f.nFramesSampled == 1)
    // 12 pixel bytes < 16 lanes: lane d holds exactly logical byte d
    val expect = Seq(10f, 20f, 30f, 40f, 50f, 60f, 70f, 80f, 90f, 100f, 110f, 120f,
      0f, 0f, 0f, 0f)
    assert(f.feature.toSeq == expect, s"got ${f.feature.toSeq}")
  }

  test("decodeBmp refuses unsupported BMP flavours loudly") {
    val buf = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54).putInt(0).putInt(54)
      .putInt(40).putInt(1).putInt(1)
      .putShort(1).putShort(8).putInt(0) // 8bpp: palette format, unsupported
      .putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val ex = intercept[IllegalArgumentException] { Multimodal.decodeBmp(1L, buf.array()) }
    assert(ex.getMessage.contains("24-bit"))
  }

  test("image payloads are real BMPs and the real decoder recovers the synthetic pixels") {
    val media = Multimodal.synthesize(spark, 30).filter(col("modality") === "image")
    val payloads = media.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    assert(payloads.nonEmpty)
    payloads.foreach { case (i, p) =>
      assert(p(0) == 'B'.toByte && p(1) == 'M'.toByte, s"media $i is not a BMP")
      val f = Multimodal.decodeBmp(i, p)
      // independent recomputation of lane 0 from the closed form
      val n = f.decodedWidth * f.decodedHeight * 3
      val lane0 = (0 until n by 16).map(pp => ((i * 31 + pp.toLong * 7) % 251).toDouble)
      assert(f.feature(0) == (lane0.sum / lane0.size).toFloat,
        s"media $i lane-0 mean mismatch")
    }
  }

  test("metadata profile never reads payload pages (column pruning)") {
    val media = Multimodal.synthesize(spark, 30)
    val tmp = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(tmp)
    val onDisk = spark.read.parquet(tmp)
    val profile = Multimodal.metadataProfile(onDisk)
    val plan = profile.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.split("ReadSchema")(1).split("\n")(0).contains("payload"),
      s"payload must be pruned from the scan:\n$plan")
    assert(profile.count() == 3)
  }
}
