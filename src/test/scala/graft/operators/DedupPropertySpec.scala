package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Jaccard pair-mining invariants on random corpora: the classed and
  * inverted-index algorithms agree everywhere, values stay in (0, 1],
  * and ids are ordered.
  */
object DedupPropertySpec extends Properties("dedup") {

  private lazy val spark = SparkSpec.session

  // small vocab forces real overlap; varying length forces unequal sizes
  private val docGen = for {
    n <- Gen.choose(1, 12)
    words <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
  } yield words.mkString(" ")

  private val corpusGen = Gen.zip(
    Gen.listOfN(12, docGen), Gen.oneOf(0.3, 0.5, 0.8))

  property("classed == inverted-index, values in (0,1], id_a < id_b") =
    Prop.forAllNoShrink(corpusGen) { case (texts, threshold) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "x") }
        .toDF("doc_id", "text", "lang")
      val a = Dedup.jaccardPairs(docs, "doc_id", "text", "lang", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val b = Dedup.jaccardPairsClassed(docs, "doc_id", "text", "lang", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val sameSet = a.map(t => (t._1, t._2)).toSet == b.map(t => (t._1, t._2)).toSet
      val sameValues = {
        val bm = b.map(t => (t._1, t._2) -> t._3).toMap
        a.forall(t => math.abs(bm(t._1 -> t._2) - t._3) < 1e-12)
      }
      val rangeOk = b.forall(t => t._3 > 0 && t._3 <= 1.0 && t._3 >= threshold)
      val orderOk = b.forall(t => t._1 < t._2)
      sameSet && sameValues && rangeOk && orderOk
    }

  property("minhash LSH finds every pair the exact miner finds (j >= 0.8)") =
    Prop.forAllNoShrink(Gen.listOfN(10, docGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "x") }
        .toDF("doc_id", "text", "lang")
      val exact = Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.minhashDupPairsClassed(docs, "doc_id", "text", "lang", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      lsh == exact
    }
}
