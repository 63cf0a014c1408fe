package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Multimodal.parseMp4]] against hand-built and synthesized ISO BMFF
  * bytes — the parser must read the real structure (big-endian box walk,
  * version-dispatched headers, 16.16 fixed-point dims, handler-gated trak
  * selection) and survive the format's two structural quirks (size==1
  * largesize, size==0 terminal box) plus mdat-before-moov layout.
  */
class Mp4Spec extends SparkSpec {

  // -- a tiny hand-built file, independent of synthMp4's builder ----------

  private def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + body.length)
    buf.putInt(8 + body.length).put(fourcc.getBytes("US-ASCII")).put(body)
    buf.array()
  }

  private def full(fourcc: String, version: Int, body: Array[Byte]): Array[Byte] =
    box(fourcc, Array[Byte](version.toByte, 0, 0, 0) ++ body)

  private def i32(vs: Long*): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(vs.length * 4)
    vs.foreach(v => buf.putInt(v.toInt))
    buf.array()
  }

  /** Minimal valid file: 320×240, 12 frames, timescale 90000, duration
    * 36000 ticks (0.4 s), codec mp4v, an hdlr='soun' decoy trak FIRST
    * (a parser that takes the first trak's dims gets 0×0).
    */
  private def handBuilt: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ i32(0))
    val mvhd = full("mvhd", 0, i32(0, 0, 90000, 36000, 0x00010000L, 0x01000000L, 0, 0,
      0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L, 0, 0, 0, 0, 0, 0, 2))
    def tkhd(w: Int, h: Int) = full("tkhd", 0,
      i32(0, 0, 1, 0, 36000, 0, 0, 0, 0,
        0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L,
        w.toLong << 16, h.toLong << 16))
    def hdlr(kind: String) = full("hdlr", 0,
      i32(0) ++ kind.getBytes("US-ASCII") ++ i32(0, 0, 0) ++ Array[Byte](0))
    def entry(codec: String) = {
      val buf = java.nio.ByteBuffer.allocate(86)
      buf.putInt(86).put(codec.getBytes("US-ASCII")).put(new Array[Byte](78))
      buf.array()
    }
    def trak(kind: String, w: Int, h: Int, codec: String, frames: Int) =
      box("trak", tkhd(w, h) ++ box("mdia",
        hdlr(kind) ++ box("minf", box("stbl",
          full("stsd", 0, i32(1) ++ entry(codec)) ++
            full("stsz", 0, i32(0, frames) ++ i32(Seq.fill(frames)(4L): _*))))))
    val moov = box("moov",
      mvhd ++ trak("soun", 0, 0, "mp4a", 99) ++ trak("vide", 320, 240, "mp4v", 12))
    val mdat = box("mdat", Array.tabulate[Byte](48)(_.toByte))
    ftyp ++ moov ++ mdat
  }

  test("hand-built file parses: clock, video-trak dims, codec, frames; decoy trak ignored") {
    val m = Multimodal.parseMp4(7L, handBuilt)
    assert(m.timescale == 90000L && m.duration == 36000L)
    assert(m.width == 320 && m.height == 240)
    assert(m.codec == "mp4v" && m.nFrames == 12)
    assert(m.durationUs == 400000L, "36000 ticks @ 90000 Hz = 0.4 s")
    assert(m.mdatLen == 48)
  }

  test("structural quirks on disk: largesize, size==0 terminal box, mdat-first all parse") {
    // video ids are i%3==2; i%9 picks the layout: 2 → mdat-first,
    // 5 → size==1 largesize, 8 → size==0 terminal
    for (i <- Seq(2L, 5L, 8L, 11L, 14L, 17L)) {
      val bytes = Multimodal.synthMp4(i)
      val (w, h, nFrames, timescale, duration, codec) = Multimodal.synthMp4Geom(i)
      val m = Multimodal.parseMp4(i, bytes)
      assert(m.width == w && m.height == h, s"dims for id=$i")
      assert(m.nFrames == nFrames && m.codec == codec, s"frames/codec for id=$i")
      assert(m.timescale == timescale && m.duration == duration, s"clock for id=$i")
      assert(m.mdatLen == 256, s"mdat body for id=$i")
      // the mdat body bytes are reachable through the parsed extent
      assert((0 until 256).forall(j =>
        bytes(m.mdatOffset + j) == ((i * 31 + j * 7) % 251).toByte), s"mdat bytes for id=$i")
    }
  }

  test("64-bit version-1 headers (odd ids) parse identically to version 0") {
    // synthMp4 writes v1 mvhd/tkhd/mdhd for odd ids — same logical values
    for (i <- Seq(5L, 11L, 17L)) {
      assert((i % 2) == 1)
      val m = Multimodal.parseMp4(i, Multimodal.synthMp4(i))
      val (_, _, _, timescale, duration, _) = Multimodal.synthMp4Geom(i)
      assert(m.timescale == timescale && m.duration == duration)
    }
  }

  test("malformed payloads fail loudly, not silently") {
    intercept[IllegalArgumentException](
      Multimodal.parseMp4(1L, Array.tabulate[Byte](32)(_.toByte))) // no ftyp
    val good = Multimodal.synthMp4(2L)
    intercept[IllegalArgumentException](
      Multimodal.parseMp4(2L, good.take(good.length / 2))) // truncated box tree
    // a valid walk but no video trak: the hand-built file minus its vide trak
    val audioOnly = {
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ i32(0))
      val mvhd = full("mvhd", 0, i32(0, 0, 1000, 500) ++ new Array[Byte](80))
      ftyp ++ box("moov", mvhd)
    }
    intercept[IllegalArgumentException](Multimodal.parseMp4(3L, audioOnly))
  }

  test("videoMetadata over the synth corpus matches the closed-form geometry") {
    val media = Multimodal.synthesize(spark, 60).filter(col("modality") === "video")
    val rows = Multimodal.videoMetadata(media).collect().sortBy(_.mediaId)
    assert(rows.length == 20)
    rows.foreach { r =>
      val (w, h, nFrames, timescale, duration, codec) = Multimodal.synthMp4Geom(r.mediaId)
      assert(r.width == w && r.height == h && r.nFrames == nFrames)
      assert(r.timescale == timescale && r.durationTicks == duration && r.codec == codec)
      assert(r.durationUs == duration * 1000000L / timescale)
    }
  }

  /** Multi-chunk sample-table fixture, independent of synthMp4: 7
    * samples with per-sample sizes [3,4,5,6,2,3,1], stsc runs
    * (first_chunk 1 → 2/chunk, first_chunk 3 → 3/chunk), three stco
    * chunks with GAPS between them (interleaved-track layout), stts
    * runs (3×Δ10, 4×Δ20), stss sync marks at samples 1 and 4
    * (1-based). Two-pass assembly like synthMp4 so stco carries real
    * absolute offsets.
    */
  private def multiChunkFile: Array[Byte] = {
    val sizes = Seq(3L, 4L, 5L, 6L, 2L, 3L, 1L)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ i32(0))
    val mvhd = full("mvhd", 0, i32(0, 0, 1000, 90, 0x00010000L, 0x01000000L, 0, 0,
      0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L, 0, 0, 0, 0, 0, 0, 2))
    val tkhd = full("tkhd", 0,
      i32(0, 0, 1, 0, 90, 0, 0, 0, 0,
        0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L,
        64L << 16, 64L << 16))
    val mdhd = full("mdhd", 0, i32(0, 0, 1000, 90) ++ Array[Byte](0x55, 0xc4.toByte, 0, 0))
    val hdlr = full("hdlr", 0,
      i32(0) ++ "vide".getBytes("US-ASCII") ++ i32(0, 0, 0) ++ Array[Byte](0))
    val entry = {
      val buf = java.nio.ByteBuffer.allocate(86)
      buf.putInt(86).put("mp4v".getBytes("US-ASCII")).put(new Array[Byte](78))
      buf.array()
    }
    def moovWith(mdatBody: Long): Array[Byte] = {
      val stbl = box("stbl",
        full("stsd", 0, i32(1) ++ entry) ++
          full("stts", 0, i32(2, 3, 10, 4, 20)) ++
          full("stsc", 0, i32(2, 1, 2, 1, 3, 3, 1)) ++
          full("stsz", 0, i32(0L +: sizes.length.toLong +: sizes: _*)) ++
          full("stco", 0, i32(3, mdatBody, mdatBody + 10, mdatBody + 25)) ++
          full("stss", 0, i32(2, 1, 4)))
      box("moov", mvhd ++ box("trak",
        tkhd ++ box("mdia", mdhd ++ hdlr ++ box("minf", stbl))))
    }
    val moovLen = moovWith(0).length
    ftyp ++ moovWith(ftyp.length + moovLen + 8L) ++
      box("mdat", Array.tabulate[Byte](40)(_.toByte))
  }

  test("mp4SampleTable: multi-chunk stsc runs, gapped stco, stts runs, stss marks") {
    val bytes = multiChunkFile
    val (samples, mediaTs) = Multimodal.mp4SampleTable(9L, bytes)
    assert(mediaTs == 1000L)
    assert(samples.length == 7)
    val expect = Seq( // (chunk, size, offsetInChunk, dts, sync)
      (0, 3L, 0L, 0L, true), (0, 4L, 3L, 10L, false),
      (1, 5L, 0L, 20L, false), (1, 6L, 5L, 30L, true),
      (2, 2L, 0L, 50L, false), (2, 3L, 2L, 70L, false), (2, 1L, 5L, 90L, false))
    samples.zip(expect).foreach { case (s, (c, sz, rel, dts, sync)) =>
      assert(s.chunkIdx == c && s.size == sz && s.offsetInChunk == rel,
        s"extent of sample ${s.sampleIdx}")
      assert(s.dtsTicks == dts, s"dts of sample ${s.sampleIdx}")
      assert(s.sync == sync, s"sync of sample ${s.sampleIdx}")
      // absolute offsets index the real mdat bytes: body byte at flat
      // position p is p (tabulate identity), chunk bases at 0/10/25
      val base = Seq(0, 10, 25)(c)
      (0 until sz.toInt).foreach { t =>
        assert(bytes(s.offset.toInt + t) == (base + rel + t).toByte,
          s"byte $t of sample ${s.sampleIdx}")
      }
    }
  }

  test("mp4SampleTable: fixed-size stsz and absent stss (all sync)") {
    // synth corpus: per-sample stsz but no stss → every sample sync;
    // single chunk at the mdat body; dts = k·(duration/nFrames)
    for (i <- Seq(2L, 5L, 8L, 11L)) {
      val (samples, mediaTs) = Multimodal.mp4SampleTable(i, Multimodal.synthMp4(i))
      val (_, _, nFrames, timescale, duration, _) = Multimodal.synthMp4Geom(i)
      assert(mediaTs == timescale)
      assert(samples.length == nFrames)
      val per = 256 / nFrames
      samples.foreach { s =>
        val expectSize = if (s.sampleIdx == nFrames - 1) 256L - per * (nFrames - 1) else per.toLong
        assert(s.chunkIdx == 0 && s.size == expectSize)
        assert(s.offsetInChunk == s.sampleIdx.toLong * per)
        assert(s.dtsTicks == s.sampleIdx * (duration / nFrames))
        assert(s.sync, "no stss box: every sample is a sync sample")
      }
    }
  }

  test("frameSamples: stride-2 selection, checksum over the real byte extents") {
    val media = Multimodal.synthesize(spark, 30).filter(col("modality") === "video")
    val rows = Multimodal.frameSamples(media, stride = 2).collect()
    val byId = rows.groupBy(_.mediaId)
    byId.foreach { case (i, rs) =>
      val (_, _, nFrames, timescale, duration, _) = Multimodal.synthMp4Geom(i)
      assert(rs.length == (nFrames + 1) / 2, s"stride-2 count for id=$i")
      val per = 256 / nFrames
      rs.foreach { r =>
        assert(r.sampleIdx % 2 == 0)
        val rel = r.sampleIdx * per
        val expected = (0 until r.size.toInt)
          .map(t => ((i * 31 + (rel + t) * 7) % 251).toByte.toLong).sum
        assert(r.byteSum == expected, s"byteSum of sample ${r.sampleIdx} id=$i")
        assert(r.dtsUs == r.dtsTicks * 1000000L / timescale)
        assert(r.dtsTicks == r.sampleIdx * (duration / nFrames))
      }
    }
  }

  test("unified decode path: video dims come from tkhd, features from mdat bytes") {
    val media = Multimodal.synthesize(spark, 30).filter(col("modality") === "video")
    val decoded = Multimodal.decodeFeatures(media, frameStride = 2).collect()
    decoded.foreach { f =>
      val (w, h, nFrames, _, _, _) = Multimodal.synthMp4Geom(f.mediaId)
      assert(f.decodedWidth == w && f.decodedHeight == h)
      assert(f.nFramesSampled == math.max(1, nFrames / 2))
      // lane 0 = mean of signed mdat bytes at index ≡ 0 (mod 16)
      val expected = (0 until 256 by 16)
        .map(j => ((f.mediaId * 31 + j * 7) % 251).toByte.toFloat).sum / 256f
      assert(math.abs(f.feature(0) - expected) < 1e-6f)
    }
  }
}
