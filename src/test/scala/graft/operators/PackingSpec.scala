package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("packConcat assigns contiguous offsets and correct bins") {
    import spark.implicits._
    // docs of 300, 300, 300 tokens at budget 512:
    //   doc 1: [0, 300)   -> bin 0, spans 1
    //   doc 2: [300, 600) -> bin 0, spans 2 (straddles the 512 cut)
    //   doc 3: [600, 900) -> bin 1, spans 1
    val df = Seq((1L, toks(300)), (2L, toks(300)), (3L, toks(300))).toDF("doc_id", "text")
    val got = Packing.packConcat(df, "doc_id", "text", 512)
      .select("doc_id", "n_tokens", "start_off", "bin", "bins_spanned")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 300L, 0L, 0L, 1L),
      (2L, 300L, 300L, 0L, 2L),
      (3L, 300L, 600L, 1L, 1L)))
  }

  test("two-phase scan agrees with the windowed form for any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 200L).map(i => (i, toks(1 + rnd.nextInt(40))))
    val df = docs.toDF("doc_id", "text").repartition(7) // scramble placement
    val twoPhase = Packing.packConcat(df, "doc_id", "text", 64)
      .select("doc_id", "n_tokens", "start_off", "bin", "bins_spanned")
    val windowed = Packing.packByGroup(
        df.withColumn("g", lit(1)), "g", "doc_id", "text", 64)
      .select("doc_id", "n_tokens", "start_off", "bin", "bins_spanned")
    assert(rowsOf(twoPhase) == rowsOf(windowed))
    graft.Caches.unpersistAll()
  }

  test("packByGroup restarts offsets per group") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, toks(10)), ("en", 2L, toks(10)),
      ("fr", 3L, toks(10))).toDF("lang", "doc_id", "text")
    val got = Packing.packByGroup(df, "lang", "doc_id", "text", 16)
      .select("doc_id", "start_off", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // fr's doc 3 restarts at offset 0; en's doc 2 starts at 10 (bin 0)
    assert(got == Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 0L, 0L)))
  }

  test("every bin except the last is exactly filled: bin boundaries partition the stream") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, toks((i % 7 + 1).toInt)))
    val df = docs.toDF("doc_id", "text")
    val rows = Packing.packConcat(df, "doc_id", "text", 32)
      .select("n_tokens", "start_off").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    // offsets are contiguous: each start = previous start + previous n
    rows.sliding(2).foreach {
      case Array((n0, s0), (_, s1)) => assert(s1 == s0 + n0)
      case _ =>
    }
    graft.Caches.unpersistAll()
  }

  test("lptShards: hand case follows the exact LPT placement sequence") {
    import spark.implicits._
    // sizes desc: 8 7 6 5 4 -> shards (k=2): 8->s0, 7->s1, 6->s1(13? no:
    // loads 8,7 -> least is s1), then loads 8,13 -> 5->s0, loads 13,13
    // -> 4->s0 (tie to lowest index)
    val docs = Seq(
      (1L, toks(8)), (2L, toks(7)), (3L, toks(6)), (4L, toks(5)), (5L, toks(4))
    ).map { case (i, t) => (i, t, "g") }.toDF("doc_id", "text", "src")
    val got = Packing.lptShards(docs, "src", "doc_id", "text", 2)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 0), (2L, 1), (3L, 1), (4L, 0), (5L, 0)))
  }

  test("lptShards: groups are independent and balance is within max-item of optimal") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 400L).map { i =>
      (i, toks(rnd.nextInt(50) + 1), s"g${i % 3}")
    }.toDF("doc_id", "text", "src")
    val out = Packing.lptShards(docs, "src", "doc_id", "text", 4)
    // every group uses shards [0, 4); per-group loads are LPT-balanced:
    // max load - min load <= max single item (Graham's bound corollary)
    val loads = out.groupBy("group", "shard")
      .agg(sum("n_tokens").as("load"), max("n_tokens").as("biggest"))
      .groupBy("group")
      .agg(max("load").as("mx"), min("load").as("mn"),
        max("biggest").as("item"), countDistinct("shard").as("ns"))
      .collect()
    assert(loads.length == 3)
    loads.foreach { r =>
      // row = (group, mx, mn, item, ns)
      assert(r.getLong(4) == 4L)
      assert(r.getLong(1) - r.getLong(2) <= r.getLong(3),
        s"unbalanced: $r")
    }
    // deterministic: same input -> same assignment regardless of layout
    val again = Packing.lptShards(docs.repartition(13), "src", "doc_id", "text", 4)
    assert(rowsOf(out) === rowsOf(again))
  }
}
