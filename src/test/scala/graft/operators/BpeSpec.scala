package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  // the Sennrich et al. (2016) worked example: vocab low:5 lower:2
  // newest:6 widest:3 — first merges are (e,s)->es (9), (es,t)->est (9),
  // (est,</w>) (9), then (l,o) (7, tie with (o,w) broken lexicographically)
  private val paperVocab: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training reproduces the paper's merge sequence with lexicographic ties") {
    val model = Bpe.trainOnVocab(paperVocab, numMerges = 6)
    assert(model.merges.take(4) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    // after (l,o): (lo,w)=7 dominates; then a 6-way tie among (e,w),
    // (n,e), (w,est</w>) breaks to the lexicographically smallest (e,w)
    assert(model.merges(4) == ("lo", "w"))
    assert(model.merges(5) == ("e", "w"))
  }

  test("encode applies learned merges; unseen words fall back toward characters") {
    val model = Bpe.trainOnVocab(paperVocab, numMerges = 5) // up to (lo,w)->low
    assert(Bpe.encodeWord("lowest", model.ranks).toSeq ==
      Seq("low", "est</w>"))
    assert(Bpe.encodeWord("newest", model.ranks).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    // fully out-of-vocabulary: nothing merges
    assert(Bpe.encodeWord("xyz", model.ranks).toSeq ==
      Seq("x", "y", "z", "</w>"))
  }

  test("distributed train + encode: corpus statistics, cache path, determinism") {
    import spark.implicits._
    // replay the paper vocab as a weighted corpus across many rows
    val rows = paperVocab.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = rows.toSeq.toDF("doc_id", "text").repartition(4)
    val m1 = Bpe.train(df, "text", numMerges = 6)
    val m2 = Bpe.train(df, "text", numMerges = 6)
    assert(m1.merges == m2.merges, "training must be deterministic")
    assert(m1.merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    val encoded = Bpe.encode(df, "doc_id", "text", m1).collect()
      .map(t => t.id -> t.tokens.toSeq).toMap
    rows.foreach { case (id, w) =>
      assert(encoded(id) == Bpe.encodeWord(w, m1.ranks).toSeq,
        s"distributed encode must equal local encode for '$w'")
    }
    // multi-word rows concatenate word tokenizations in order
    val multi = Seq((0L, "low lowest")).toDF("doc_id", "text")
    val got = Bpe.encode(multi, "doc_id", "text",
      Bpe.BpeModel(m1.merges.take(5))).collect()(0).tokens.toSeq
    assert(got == Seq("low", "</w>", "low", "est</w>"), got.toString)
  }

  test("token accounting on real documents: total subwords >= total words, reversible") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, "text", numMerges = 100)
    assert(model.merges.length == 100)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
    val stats = enc.map(t => (t.id, t.tokens.length,
        t.tokens.map(_.replace(Bpe.EndOfWord, " ")).mkString("").trim))
      .toDF("doc_id", "n_tokens", "detok").collect()
    val words = docs.select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n_words"),
        lower(trim(col("text"))).as("orig"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    stats.foreach { r =>
      val (nWords, orig) = words(r.getLong(0))
      assert(r.getInt(1) >= nWords, "every word is >= 1 subword")
      // BPE is lossless: concatenating subwords and restoring </w> as
      // spaces reproduces the normalized text
      assert(r.getString(2) == orig.replaceAll("\\s+", " "),
        s"detokenization mismatch for doc ${r.getLong(0)}")
    }
  }
}
