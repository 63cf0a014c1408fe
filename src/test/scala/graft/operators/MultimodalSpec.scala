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
