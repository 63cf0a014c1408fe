package graft.operators

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  // the Hugging Face course's WordPiece worked example:
  // hug:10 pug:5 pun:12 bun:4 hugs:5
  // symbolized: h ##u ##g | p ##u ##g | p ##u ##n | b ##u ##n | h ##u ##g ##s
  // symbol counts: h=15 p=17 b=4 ##u=36 ##g=20 ##n=16 ##s=5
  // pair scores: every ##u pair scores 1/36 (count cancels against its
  // own factor), while (##g,##s) = 5/(20*5) = 1/20 — the unique winner.
  private val hfVocab: Array[(String, Long)] =
    Array(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  private val hfAlphabet: Array[String] =
    "hugpnbs".flatMap(c => Seq(c.toString, "##" + c)).toArray

  test("training picks the likelihood-best pair, then breaks exact ties lexicographically") {
    val model = WordPiece.trainOnVocab(hfVocab, hfAlphabet, numMerges = 2)
    assert(model.merges.head == ("##g", "##s"),
      "first merge must be the unique 1/20 scorer, not a raw-frequency winner")
    assert(model.vocab.contains("##gs"))
    // after the first merge every remaining pair scores exactly 1/36;
    // the BigInt tie comparison must see them EQUAL and take the
    // lexicographically smallest pair ("##u","##g")
    assert(model.merges(1) == ("##u", "##g"))
    assert(model.vocab.contains("##ug"))
  }

  test("greedy longest-match-first tokenization (the published algorithm)") {
    val vocab = Set("un", "##aff", "##able", "u", "##n", "##a", "##f",
      "##b", "##l", "##e", "hug", "##s", "h", "##u", "##g")
    assert(WordPiece.encodeWord("unaffable", vocab, 100).toSeq ==
      Seq("un", "##aff", "##able"))
    assert(WordPiece.encodeWord("hugs", vocab, 100).toSeq == Seq("hug", "##s"))
    // longest match wins over the single-char path ("un" not "u ##n")
    assert(WordPiece.encodeWord("un", vocab, 100).toSeq == Seq("un"))
    // single-char fallback keeps coverage when no long piece matches
    assert(WordPiece.encodeWord("ue", vocab, 100).toSeq == Seq("u", "##e"))
  }

  test("[UNK] on unseen characters and on the maxChars guard") {
    val vocab = Set("a", "##b", "##a", "b")
    assert(WordPiece.encodeWord("abz", vocab, 100).toSeq == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("ab", vocab, 1).toSeq == Seq(WordPiece.Unk),
      "words longer than maxChars must collapse to [UNK] (the BERT guard)")
    assert(WordPiece.encodeWord("ab", vocab, 100).toSeq == Seq("a", "##b"))
  }

  test("decode glues continuations and spaces word starts") {
    assert(WordPiece.decode(Seq("un", "##aff", "##able", "hug", "##s")) ==
      "unaffable hugs")
    assert(WordPiece.decode(Nil) == "")
  }

  test("distributed train + encode: full-corpus alphabet, zero UNK, lossless, deterministic") {
    import spark.implicits._
    val rows = hfVocab.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w + " " + w.reverse) }
    val df = rows.toSeq.toDF("doc_id", "text").repartition(4)
    val m1 = WordPiece.train(df, "text", numMerges = 4)
    val m2 = WordPiece.train(df, "text", numMerges = 4)
    assert(m1.merges == m2.merges, "training must be deterministic")
    // the alphabet came from the FULL corpus, so every word (including
    // the reversed ones outside any merge) tokenizes without [UNK] and
    // decodes back exactly
    val encoded = WordPiece.encode(df, "doc_id", "text", m1).collect()
    assert(encoded.length == rows.length)
    encoded.foreach { t =>
      assert(!t.tokens.contains(WordPiece.Unk))
      val norm = rows.toMap.apply(t.id)
      assert(WordPiece.decode(t.tokens.toSeq) == norm,
        s"round-trip failed for '$norm': ${t.tokens.mkString("|")}")
      val nChars = norm.replace(" ", "").length
      val nWords = 2
      assert(t.tokens.length >= nWords && t.tokens.length <= nChars)
    }
  }
}
