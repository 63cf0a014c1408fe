package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage for the real BMP and WAV decoders: the synthesized
  * q36 images all have width % 4 == 0 (rowSize == pixel bytes, zero
  * padding), so random SMALL geometries — odd widths force 1–3 padding
  * bytes per row — are the only coverage of the padding arithmetic
  * across the space; likewise synthWav never writes junk chunks or
  * 8-bit PCM, so random chunk layouts below are the only coverage of
  * the RIFF walker's pad-byte and centering rules. Pure byte work, no
  * Spark session.
  */
object MultimodalPropertySpec extends Properties("multimodal") {

  private val geom = for {
    w <- Gen.choose(1, 9)
    h <- Gen.choose(1, 9)
    i <- Gen.choose(0L, 5000L)
  } yield (w, h, i)

  property("decodeBmp recovers dims + exact lane means for any geometry incl. padded rows") =
    Prop.forAll(geom) { case (w, h, i) =>
      val f = Multimodal.decodeBmp(i, Multimodal.synthBmp(i, w, h))
      val n = w * h * 3
      val lanes = (0 until 16).map { d =>
        val vs = (d until n by 16).map(p => ((i * 31 + p.toLong * 7) % 251).toDouble)
        if (vs.isEmpty) 0f else (vs.sum / vs.size).toFloat
      }
      f.mediaId == i && f.modality == "image" &&
        f.decodedWidth == w && f.decodedHeight == h &&
        f.nFramesSampled == 1 && f.feature.toSeq == lanes
    }

  // ---- WAV: random geometry/bit-depth/junk-chunk layouts ----
  // synthWav always writes 16-bit with the canonical chunk order and no
  // stray chunks; random layouts — odd-sized junk chunks force the RIFF
  // pad-byte rule, 8-bit forces the unsigned-center path — are the only
  // coverage of the chunk walker across the space.

  private val junkChunk: Gen[Array[Byte]] = for {
    sz <- Gen.choose(0, 9) // odd sizes exercise the pad byte
    id <- Gen.oneOf("LIST", "fact", "cue ", "bext")
  } yield {
    val b = java.nio.ByteBuffer.allocate(8 + sz + (sz & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(sz)
      .put(Array.tabulate[Byte](sz + (sz & 1))(k => (k * 13 + sz).toByte))
    b.array()
  }

  private val wavCase = for {
    rate <- Gen.choose(1, 96000)
    channels <- Gen.choose(1, 3)
    bits <- Gen.oneOf(8, 16)
    nFrames <- Gen.choose(0, 40)
    samples <- Gen.listOfN(nFrames * channels,
      if (bits == 16) Gen.choose(-32768, 32767) else Gen.choose(-128, 127))
    pre <- Gen.listOf(junkChunk).map(_.take(3))
    mid <- Gen.listOf(junkChunk).map(_.take(3))
  } yield (rate, channels, bits, samples, pre, mid)

  private def buildWav(rate: Int, channels: Int, bits: Int, samples: Seq[Int],
                       pre: Seq[Array[Byte]], mid: Seq[Array[Byte]]): Array[Byte] = {
    val dataSize = samples.size * (bits / 8)
    val block = channels * bits / 8
    val junkLen = (pre ++ mid).map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(12 + junkLen + 24 + 8 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(buf.capacity - 8)
      .put("WAVE".getBytes("US-ASCII"))
    pre.foreach(buf.put)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * block).putShort(block.toShort).putShort(bits.toShort)
    mid.foreach(buf.put)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    if (bits == 16) samples.foreach(v => buf.putShort(v.toShort))
    else samples.foreach(v => buf.put((v + 128).toByte))
    buf.array()
  }

  property("parseWav recovers fmt fields + exact samples through any chunk layout") =
    Prop.forAll(wavCase) { case (rate, channels, bits, samples, pre, mid) =>
      val pcm = Multimodal.parseWav(1L,
        buildWav(rate, channels, bits, samples, pre, mid))
      pcm.sampleRate == rate && pcm.channels == channels && pcm.bits == bits &&
        pcm.nFrames == samples.size / channels && pcm.samples.toSeq == samples
    }

  property("wavStats peak/sumSq/rms/duration match brute force for any PCM content") =
    Prop.forAll(wavCase) { case (rate, channels, bits, samples, pre, mid) =>
      val st = Multimodal.wavStats(2L,
        buildWav(rate, channels, bits, samples, pre, mid))
      val sumSq = samples.map(v => v.toLong * v).sum
      val rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq.toDouble / samples.size)
      st.peak == (if (samples.isEmpty) 0 else samples.map(math.abs).max) &&
        st.sumSq == sumSq && st.rms == rms &&
        st.durationUs == (samples.size / channels).toLong * 1000000L / rate
    }
}
