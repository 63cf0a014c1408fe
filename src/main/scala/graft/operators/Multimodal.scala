package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM data pipelines: image/audio/video
  * payloads ride as opaque `BinaryType` columns next to typed metadata;
  * decode / feature-extraction runs partition-wise so heavyweight codec
  * state is initialized once per partition, not per row (the Scala analog
  * of arrow-batched pandas UDFs on a Python cluster).
  *
  * The codecs themselves are NOT in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (parses our own synthetic header);
  * everything around it — schema, batching, partitioning, output contract —
  * is real and tested. Swap `decodePayload` for a jni/ffmpeg/javacv call
  * and nothing else changes.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. At 100 TB the
    * payload column dominates — keep it LAST in the schema (parquet column
    * pruning means metadata-only queries never touch payload pages), and
    * size row groups so a row group's payloads fit executor memory.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("payload", BinaryType)))

  /** Deterministic synthetic media: a 16-byte header (modality tag, width,
    * height, n_frames) + pseudo-random body derived from the id. Stands in
    * for real scraped bytes in tests/benchmarks.
    */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val modality = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val w = 64 + (i % 8).toInt * 32
      val h = 64 + (i % 5).toInt * 32
      val frames = if (modality == "video") 8 + (i % 4).toInt else 1
      val header = java.nio.ByteBuffer.allocate(16)
        .put(modality.head.toByte).put(0.toByte)
        .putShort(w.toShort).putShort(h.toShort).putShort(frames.toShort)
        .putLong(i)
      val body = Array.tabulate[Byte](256)(j => ((i * 31 + j * 7) % 251).toByte)
      (i, modality, w, h, frames, header.array() ++ body)
    }.toDF("media_id", "modality", "width", "height", "n_frames", "payload")
  }

  /** Decoded-frame contract produced by [[decodeFeatures]]. */
  case class MediaFeatures(mediaId: Long, modality: String,
                           decodedWidth: Int, decodedHeight: Int,
                           nFramesSampled: Int, feature: Array[Float])

  /** STUB — deterministic fake decode. A real implementation would hand
    * `payload` to an image/audio codec here; this parses the synthetic
    * header and derives a 16-dim feature from the body bytes so the whole
    * pipeline is testable end-to-end without native codecs.
    */
  private[operators] def decodePayload(payload: Array[Byte], frameStride: Int): MediaFeatures = {
    val buf = java.nio.ByteBuffer.wrap(payload)
    val tag = buf.get(); buf.get()
    val w = buf.getShort.toInt; val h = buf.getShort.toInt
    val frames = buf.getShort.toInt; val id = buf.getLong
    val modality = tag.toChar match {
      case 'i' => "image"; case 'a' => "audio"; case _ => "video"
    }
    val sampled = math.max(1, frames / math.max(1, frameStride))
    val body = payload.drop(16)
    val feature = Array.tabulate(16) { d =>
      var acc = 0f
      var j = d
      while (j < body.length) { acc += body(j); j += 16 }
      acc / body.length
    }
    MediaFeatures(id, modality, w, h, sampled, feature)
  }

  /** Partition-wise decode + feature extraction. `mapPartitions` so a real
    * codec/model would be constructed once per partition (the expensive
    * part), then stream rows through it — the exact shape arrow-batched
    * UDFs give a Python cluster. Repartition first when upstream
    * partitioning is skewed by payload size.
    */
  def decodeFeatures(media: DataFrame, frameStride: Int = 2,
                     partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val input = if (partitions > 0) media.repartition(partitions) else media
    input.select("payload").as[Array[Byte]].mapPartitions { it =>
      // real impl: val codec = HeavyCodec.open()  (once per partition)
      it.map(p => decodePayload(p, frameStride))
    }
  }

  /** Metadata-only profile — must NOT read payload pages (verify with
    * .explain: ReadSchema excludes `payload`).
    */
  def metadataProfile(media: DataFrame): DataFrame =
    media.groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        avg(col("width") * col("height")).as("avg_pixels"),
        sum(col("n_frames")).as("total_frames"))
}
