package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  test("chunks cover every token; overlap equals size - stride") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.chunkTokens(df, "doc_id", "text", 32, 16)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // starts at 0,16,...,96 -> 7 chunks; each carries min(32, 100-start)
    assert(rows.length == 7)
    assert(rows.zipWithIndex.forall { case ((_, _, n), i) =>
      n == math.min(32, 100 - i * 16)
    })
    // consecutive chunks overlap by 16 tokens
    val c0 = rows(0)._2.split(" ")
    val c1 = rows(1)._2.split(" ")
    assert(c0.drop(16).toSeq == c1.take(16).toSeq)
    // concatenating the non-overlapped prefixes reconstructs the doc
    val rebuilt = rows.init.flatMap(_._2.split(" ").take(16)) ++ rows.last._2.split(" ")
    assert(rebuilt.mkString(" ") == text)
  }

  test("short and empty docs") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val rows = Chunking.chunkTokens(df, "doc_id", "text", 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 0L, "a b c"), (2L, 0L, "solo")))
  }

  test("chunking is map-side: no Exchange in the plan") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val chunked = Chunking.chunkTokens(df, "doc_id", "text", 4, 2)
    chunked.collect()
    assert(!chunked.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("spanDedup keeps the global first occurrence of a shared span only") {
    import spark.implicits._
    // span=2: doc 1 = [a b][c d]; doc 2 = [a b][x y]; doc 3 = [c d][c d]
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d c d")).toDF("doc_id", "text")
    val got = Chunking.spanDedup(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((2L, 0L, "a b c d")))      // doc 1 owns both first occurrences
    assert(got(2L) == ((1L, 1L, "x y")))          // its "a b" is a later copy → dropped
    assert(got(3L) == ((0L, 2L, "")))             // both spans are copies of doc 1's "c d"
  }

  test("spanDedup also collapses duplicate spans WITHIN one document") {
    import spark.implicits._
    val df = Seq((5L, "p q p q p q")).toDF("doc_id", "text")
    val r = Chunking.spanDedup(df, "doc_id", "text", 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((1L, 2L, "p q")))
  }

  test("spanDedup raises on an id that would overflow the packed key") {
    import spark.implicits._
    // id > Long.MaxValue >> 20: id*2^20 would wrap negative and silently
    // corrupt min()-based first-occurrence order — must raise instead
    val df = Seq(((Long.MaxValue >> 20) + 1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Chunking.spanDedup(df, "doc_id", "text", 2).collect()
    }
    assert(e.getMessage.contains("spanDedup"), e.getMessage)
  }

  test("contentDefinedChunks: lossless cover, and edits shift ONE chunk (the CDC property)") {
    import spark.implicits._
    val base = new scala.util.Random(42).alphanumeric.take(400).mkString
    val edited = "INSERTED!!" + base // 10-char prefix insertion
    val docs = Seq((1L, base), (2L, edited), (3L, ""), (4L, "tiny")).toDF("doc_id", "text")
    val chunks = Chunking.contentDefinedChunks(docs, "doc_id", "text",
        window = 8, modulus = 16)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // lossless cover: chunks tile [1, len] contiguously per doc
    for ((id, txt) <- Seq((1L, base), (2L, edited), (4L, "tiny"))) {
      val cs = chunks.filter(_._1 == id)
      assert(cs.head._3 == 1L && cs.map(_._4).sum == txt.length,
        s"doc $id chunks must cover the text exactly")
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $id gap at ${b._2}")
        case _ =>
      }
    }
    assert(!chunks.exists(_._1 == 3L), "empty doc yields no chunks")
    // CDC edit locality: every boundary whose window clears the
    // insertion survives the shift, so at most the FIRST base chunk is
    // re-fingerprinted — the edited doc must end with base's chunks
    // 2..n verbatim (here the insertion even lands on a boundary, so
    // ALL base fingerprints survive with two new leading chunks)
    val a = chunks.filter(_._1 == 1L).map(_._5).toSeq
    val b = chunks.filter(_._1 == 2L).map(_._5).toSeq
    assert(a.size >= 3, s"fixture must produce several chunks, got ${a.size}")
    assert(b.takeRight(a.size - 1) == a.drop(1),
      "a prefix edit must leave every post-edit chunk fingerprint intact")
    assert(b.size >= a.size, "the insertion cannot reduce the chunk count here")
  }

  test("spanDedup of an all-unique corpus is the identity (modulo tail chunking)") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, (1 to 17).map(j => s"w${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = Chunking.spanDedup(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    docs.foreach { case (id, text) => assert(got(id) == text) }
  }
}
