package graft.operators

import graft.SparkSpec

/** PNG/JPEG decode through [[Multimodal.decodeRgb]]: lossless-exactness
  * for PNG, perceptual bounds for JPEG, and loud refusals for the
  * garbage a 100 TB corpus will contain (truncated files, lying magic
  * bytes, unknown formats).
  */
class ImageCodecsSpec extends SparkSpec {

  private def dims(i: Long): (Int, Int) =
    (16 + (i % 6).toInt * 8, 16 + (i % 5).toInt * 8)

  test("PNG round trip is bit-exact: dHash equals the BMP byte path on all 100 images") {
    (0L until 300L by 3L).foreach { i =>
      val (w, h) = dims(i)
      val bmp = Multimodal.dHashImage(i, Multimodal.synthBmp(i, w, h), 0)
      val png = Multimodal.dHashImage(i, Multimodal.synthPng(i, w, h), 0)
      assert(bmp == png, s"PNG dHash diverged from lossless BMP at media_id=$i")
    }
  }

  test("PNG pooled cell means are exactly the BMP means (lossless codec, same doubles)") {
    Seq(0L, 3L, 27L, 297L).foreach { i =>
      val (w, h) = dims(i)
      val a = Multimodal.poolImage(i, Multimodal.synthBmp(i, w, h), 4, 4)
      val b = Multimodal.poolImage(i, Multimodal.synthPng(i, w, h), 4, 4)
      assert(a == b, s"PNG pool diverged at media_id=$i")
    }
  }

  test("JPEG round trip stays perceptually close: dHash hamming <= 16, pool delta <= 24") {
    (0L until 300L by 3L).foreach { i =>
      val (w, h) = dims(i)
      val ref = Multimodal.dHashImage(i, Multimodal.synthBmp(i, w, h), 0)
      val jpg = Multimodal.dHashImage(i, Multimodal.synthJpeg(i, w, h), 0)
      val ham = java.lang.Long.bitCount(ref ^ jpg)
      assert(ham <= 16, s"JPEG dHash hamming $ham > 16 at media_id=$i")
    }
    Seq(0L, 33L, 144L).foreach { i =>
      val (w, h) = dims(i)
      val a = Multimodal.poolImage(i, Multimodal.synthBmp(i, w, h), 4, 4)
      val b = Multimodal.poolImage(i, Multimodal.synthJpeg(i, w, h), 4, 4)
      a.zip(b).foreach { case (x, y) =>
        val d = math.abs(x.rMean - y.rMean)
          .max(math.abs(x.gMean - y.gMean)).max(math.abs(x.bMean - y.bMean))
        assert(d <= 24.0, s"JPEG pooled mean drifted $d > 24 gray levels at media_id=$i")
      }
    }
  }

  test("distributed path: imageDHash over a PNG corpus matches the BMP corpus row for row") {
    val png = Multimodal.imageDHash(Multimodal.synthesizeImages(spark, 30, "png"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bmp = Multimodal.imageDHash(Multimodal.synthesizeImages(spark, 30, "bmp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(png.nonEmpty && png == bmp)
  }

  test("property: PNG round trip is lossless for random dims and random pixels") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 25) {
      val w = 9 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y * w + x))
      val bos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      javax.imageio.ImageIO.write(img, "png", out); out.flush(); out.close()
      val dec = Multimodal.decodeRgb(1L, bos.toByteArray, "prop")
      assert(dec.w == w && dec.h == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((dec.rgb(x, y) & 0xffffff) == px(y * w + x),
          s"pixel ($x,$y) of ${w}x$h differs")
    }
  }

  test("refusal: truncated PNG fails cleanly with the media_id, not an array crash") {
    val whole = Multimodal.synthPng(3L, 16, 16)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.dHashImage(3L, whole.take(whole.length / 2), 0)
    }
    assert(ex.getMessage.contains("media_id=3"), ex.getMessage)
  }

  test("refusal: truncated JPEG fails cleanly") {
    val whole = Multimodal.synthJpeg(3L, 32, 32)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.poolImage(3L, whole.take(whole.length / 3), 4, 4)
    }
    assert(ex.getMessage.contains("media_id=3"), ex.getMessage)
  }

  test("refusal: lying magic bytes (PNG header, garbage body) fail cleanly") {
    val hostile = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](64)(0x41)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.dHashImage(9L, hostile, 0)
    }
    assert(ex.getMessage.contains("media_id=9"), ex.getMessage)
  }

  test("refusal: unknown format (WebP — no JDK decoder) is named as such") {
    val webp = "RIFF....WEBPVP8 ".getBytes ++ Array.fill[Byte](32)(0)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeRgb(5L, webp, "imagePool")
    }
    assert(ex.getMessage.contains("BMP/PNG/JPEG/GIF") && ex.getMessage.contains("media_id=5"))
  }

  // ---- GIF (round 11): palette-exact round trip, first-frame-of-
  // animated convention, refusals ------------------------------------

  test("GIF round trip is palette-exact: every decoded pixel equals the closed form") {
    Seq(0L, 3L, 27L, 144L, 297L).foreach { i =>
      val (w, h) = dims(i)
      val dec = Multimodal.decodeRgb(i, Multimodal.synthGif(i, w, h), "spec")
      assert(dec.w == w && dec.h == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = Multimodal.gifPaletteRgb(Multimodal.gifPixelIndex(i, x, y))
        assert((dec.rgb(x, y) & 0xffffff) == want,
          s"GIF pixel ($x,$y) of media_id=$i diverged from the palette closed form")
      }
    }
  }

  test("animated GIF decodes to its FIRST frame") {
    def solid(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    writer.writeToSequence(
      new javax.imageio.IIOImage(solid(0xff0000), null, null),
      writer.getDefaultWriteParam)
    writer.writeToSequence(
      new javax.imageio.IIOImage(solid(0x0000ff), null, null),
      writer.getDefaultWriteParam)
    writer.endWriteSequence()
    ios.flush(); writer.dispose(); ios.close()
    val payload = bos.toByteArray
    assert(payload.take(4).sameElements("GIF8".getBytes),
      "the sequence writer must produce a real GIF header")
    val dec = Multimodal.decodeRgb(11L, payload, "spec")
    assert(dec.w == 16 && dec.h == 16)
    assert((dec.rgb(8, 8) & 0xffffff) == 0xff0000,
      "an animated GIF must decode to its first frame, got a later one")
  }

  test("distributed path: imageDHash over the GIF corpus is non-trivial and id-stable") {
    val rows = Multimodal.imageDHash(Multimodal.synthesizeGifImages(spark, 30))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == (0L until 30L by 3L).toSet)
    assert(rows.values.toSet.size > 1, "palette pattern must not hash all-equal")
  }

  test("refusal: truncated GIF fails cleanly with the media_id") {
    val whole = Multimodal.synthGif(3L, 16, 16)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.dHashImage(3L, whole.take(whole.length / 2), 0)
    }
    assert(ex.getMessage.contains("media_id=3"), ex.getMessage)
  }

  test("refusal: payload too short to even sniff") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.decodeRgb(6L, Array[Byte](1, 2, 3), "imagePool")
    }
    assert(ex.getMessage.contains("media_id=6"))
  }
}
