package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  // planted morphology: four morphemes reused across words — the
  // unigram LM should put its mass on them, not on the one-off
  // substrings that straddle morpheme boundaries
  private val planted: Array[(String, Long)] = Array(
    "prefix" -> 12L, "fixing" -> 12L, "prerun" -> 10L,
    "runing" -> 10L, "runfix" -> 8L, "prefixing" -> 4L)

  test("EM recovers the planted morphemes: Viterbi segments along morpheme boundaries") {
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 5)
    assert(model.segment("prefixing") == Seq("pre", "fix", "ing"),
      s"got ${model.segment("prefixing")}")
    assert(model.segment("runing") == Seq("run", "ing"))
    assert(model.segment("prerun") == Seq("pre", "run"))
    // EM moved mass toward the reused morphemes relative to the seed
    val pre = model.pieces("pre")
    val seedTotal = model.pieces.values.map(_.seedScore).sum.toDouble
    assert(pre.prob > pre.seedScore / seedTotal,
      s"EM should grow 'pre' beyond its seed share: ${pre.prob} vs " +
        s"${pre.seedScore / seedTotal}")
  }

  test("unknown characters fall back to single-char UNK tokens") {
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 2)
    assert(model.segment("qzj") == Seq("q", "z", "j"))
    assert(model.tokenCount("preqzj") == 1 + 3) // "pre" + 3 UNK chars
  }

  test("fit is deterministic: two trains produce identical models") {
    val df = planted.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val m1 = UnigramLm.fit(df, "text", maxPieceLen = 4, seedMulti = 60, iters = 2)
    val m2 = UnigramLm.fit(df, "text", maxPieceLen = 4, seedMulti = 60, iters = 2)
    assert(m1.pieces == m2.pieces)
    assert(m1.llq == m2.llq)
  }

  test("tokenCounts: map-side sums match per-word Viterbi; no-gram rows count zero") {
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 2)
    val df = Seq((1L, "prefix runing"), (2L, "prefixing"), (3L, "   "))
      .toDF("doc_id", "text")
    val got = UnigramLm.tokenCounts(df, "doc_id", "text", model)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Seq(
      (1L, 2L, (model.tokenCount("prefix") + model.tokenCount("runing")).toLong),
      (2L, 1L, model.tokenCount("prefixing").toLong),
      (3L, 0L, 0L))
    assert(got == expected, s"got $got expected $expected")
    // subword counts sit between whole words and characters
    assert(got(0)._3 >= got(0)._2 && got(0)._3 <= "prefixruning".length)
  }

  test("prune round keeps the reused morphemes, drops boundary-straddlers, " +
      "and segmentation survives") {
    val df = planted.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val pruned = UnigramLm.fitPruned(df, "text", maxPieceLen = 4,
      seedMulti = 60, emIters = 2, keepMulti = 6, finalIters = 2)
    val multi = pruned.pieces.keySet.filter(_.length > 1)
    assert(multi.size <= 6)
    // the planted morphemes carry the expected-count mass and survive
    // a cut to 6 multi-char pieces; straddlers like "efix" don't
    Seq("pre", "fix", "ing", "run").foreach(m =>
      assert(multi.contains(m), s"morpheme '$m' must survive the prune: $multi"))
    assert(!multi.contains("efix") && !multi.contains("xing"))
    assert(pruned.segment("prefixing") == Seq("pre", "fix", "ing"))
    // single chars always survive (coverage): every corpus char present
    assert(planted.flatMap(_._1.toSeq).toSet
      .forall(c => pruned.pieces.contains(c.toString)))
  }

  test("token-count parity: unigram counts track the BPE-regex counter on word text") {
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 3)
    val df = Seq((1L, "prefix fixing prerun runing")).toDF("doc_id", "text")
    val uni = UnigramLm.tokenCounts(df, "doc_id", "text", model)
      .collect()(0).getLong(2)
    val bpeish = df.select(
      graft.functions.TextFunctions.bpeishTokenCount(col("text"))).collect()(0).getInt(0)
    // letters-only words: the BPE regex yields one token per word; the
    // trained subword model splits each into its ~2 morphemes — the
    // expected relation for morphologically regular text
    assert(bpeish == 4 && uni == 8L, s"bpeish=$bpeish uni=$uni")
  }
}
