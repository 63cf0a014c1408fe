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

  test("nBest: rank 1 is the Viterbi optimum, ranks follow the exact total order") {
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 5)
    Seq("prefixing", "runing", "prerun", "runfix").foreach { w =>
      val nb = model.nBestSegmentations(w, 3)
      assert(nb.nonEmpty && nb.length <= 3)
      // rank 1 carries the same optimum (score, tokens) as segment()
      val vit = model.segment(w)
      val vitScore = vit.map(p => model.llq.getOrElse(p, UnigramLm.UnkLlq)).sum
      assert(nb.head._1 == vitScore && nb.head._2 == vit.length,
        s"$w rank-1 ${nb.head} vs viterbi ($vitScore, ${vit.length})")
      assert(nb.head._3 == vit.mkString("|"),
        s"$w rank-1 witness must be the Viterbi path on this fixture")
      // each rank's score is the exact llq sum of its own pieces
      nb.foreach { case (s, n, seg) =>
        val pieces = seg.split("\\|").toSeq
        assert(pieces.length == n)
        assert(pieces.map(p => model.llq.getOrElse(p, UnigramLm.UnkLlq)).sum == s,
          s"$w: $seg must score exactly $s")
      }
      // strict total order: (score desc, n asc, seg asc), no dup paths
      nb.sliding(2).foreach {
        case Vector((s1, n1, g1), (s2, n2, g2)) =>
          assert(s1 > s2 || (s1 == s2 && (n1 < n2 || (n1 == n2 && g1 < g2))),
            s"$w ranks out of order: ($s1,$n1,$g1) then ($s2,$n2,$g2)")
        case _ =>
      }
      assert(nb.map(_._3).distinct.length == nb.length, "paths must be distinct")
    }
    // a 1-char word has exactly one path regardless of k
    val one = model.nBestSegmentations("p", 3)
    assert(one.length == 1 && one.head._2 == 1)
    // empty word → no paths; k must be >= 1
    assert(model.nBestSegmentations("", 3).isEmpty)
    intercept[IllegalArgumentException](model.nBestSegmentations("pre", 0))
  }

  test("nBestTable: distinct-word table, rank-1 token counts agree with tokenCounts") {
    import spark.implicits._
    val df = planted.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
      .toDF("doc_id", "text")
    val model = UnigramLm.fitOnVocab(planted, maxPieceLen = 4,
      seedMulti = 60, iters = 5)
    val nb = UnigramLm.nBestTable(df, "text", model, k = 3)
    val rows = nb.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq == planted.map(_._1).sorted.toSeq,
      "one group per distinct corpus word")
    rows.filter(_._2 == 1L).foreach { case (w, _, _, n, _) =>
      assert(n == model.tokenCount(w), s"$w rank-1 token count")
    }
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
  }
}
