package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Property coverage for the real BMP decoder: the synthesized q36
  * images all have width % 4 == 0 (rowSize == pixel bytes, zero
  * padding), so random SMALL geometries — odd widths force 1–3 padding
  * bytes per row — are the only coverage of the padding arithmetic
  * across the space. Pure byte work, no Spark session.
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
}
