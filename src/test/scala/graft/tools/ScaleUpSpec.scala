package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The 10× bench's evidentiary weight rests on the synthesizer doing
  * what it claims — these pin the claims: exact ×factor row counts,
  * disjoint key spaces whose FKs resolve inside their copy, unscaled
  * dimensions, and copy 0 byte-identical to the base data.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = Files.createTempDirectory("scaleup").toString
    ScaleUp.run(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  private def base(n: String) = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
  private def scaled(n: String) = spark.read.parquet(s"$outDir/$n.parquet")

  test("row counts scale by exactly the factor; dimensions stay fixed") {
    for (t <- Seq("customer", "orders", "lineitem", "part", "supplier",
        "documents", "embeddings", "events"))
      assert(scaled(t).count() == 3 * base(t).count(), t)
    for (t <- Seq("nation", "region"))
      assert(scaled(t).count() == base(t).count(), t)
  }

  test("key spaces are disjoint: the scaled key column stays unique where the base was") {
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id", "events" -> "event_id")) {
      val df = scaled(t)
      assert(df.select(k).distinct().count() == df.count(), s"$t.$k collides across copies")
    }
  }

  test("foreign keys resolve inside their own copy (no dangling references)") {
    val danglingCust = scaled("orders").join(scaled("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(danglingCust == 0, s"$danglingCust orders reference no customer")
    val danglingOrd = scaled("lineitem").join(scaled("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(danglingOrd == 0, s"$danglingOrd lineitems reference no order")
    val danglingPart = scaled("lineitem").join(scaled("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(danglingPart == 0, s"$danglingPart lineitems reference no part")
  }

  test("copy 0 is the base data verbatim (literal-id probe sets survive scaling)") {
    val baseIds = base("embeddings").select("vec_id", "label")
    val copy0 = scaled("embeddings")
      .join(baseIds.select("vec_id"), "vec_id")
      .select("vec_id", "label")
    assert(rowsOf(copy0) == rowsOf(baseIds))
  }

  test("perturbText is deterministic, edit-bounded, and actually edits") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val a = ScaleUp.perturbText(text, seed = 7L)
    val b = ScaleUp.perturbText(text, seed = 7L)
    assert(a == b, "same seed must give the same edit")
    assert(a != text, "a 200-token doc at 5%/5% rates is edited w.p. ~1")
    assert(ScaleUp.perturbText(text, seed = 8L) != a, "different seeds diverge")
    // token multiset shrinks only by drops: ~5% expected, bound loosely
    val kept = a.split(" ").length
    assert(kept <= 200 && kept >= 160, s"drop rate out of band: kept $kept/200")
    // near-dup, not rewrite: token-set Jaccard vs the original stays high
    val (sa, st) = (a.split(" ").toSet, text.split(" ").toSet)
    val jac = (sa & st).size.toDouble / (sa | st).size
    assert(jac > 0.8, f"perturbed copy drifted too far: jaccard=$jac%.2f")
  }

  private lazy val perturbDir: String = {
    val dir = Files.createTempDirectory("scaleup-perturb").toString
    ScaleUp.run(spark, "/root/testdata/sf0.001", dir, 3, perturb = true)
    dir
  }
  private def perturbed(n: String) = spark.read.parquet(s"$perturbDir/$n.parquet")

  test("perturb mode: copy 0 verbatim, copies k>=1 near-duplicates, n_chars consistent") {
    val baseDocs = base("documents").select("doc_id", "text")
    val docs = perturbed("documents")
    assert(docs.count() == 3 * baseDocs.count())
    // copy 0 (doc_ids inside the base key space) is byte-identical
    val copy0 = docs.join(baseDocs.withColumnRenamed("text", "base_text"), "doc_id")
    assert(copy0.filter(col("text") =!= col("base_text")).count() == 0,
      "copy 0 must stay the base data verbatim")
    // copies k>=1: text differs from its base doc but stays similar in length
    val stride = base("documents").agg(max(col("doc_id"))).head.getLong(0) + 1
    val copy1 = docs.filter(col("doc_id") >= stride && col("doc_id") < 2 * stride)
      .withColumn("base_id", col("doc_id") - stride)
      .join(baseDocs.withColumnRenamed("doc_id", "base_id")
        .withColumnRenamed("text", "base_text"), "base_id")
    val n = copy1.count()
    val edited = copy1.filter(col("text") =!= col("base_text")).count()
    assert(edited > n * 0.9, s"only $edited/$n perturbed copies differ from base")
    // n_chars is recomputed to match the perturbed text
    assert(docs.filter(col("n_chars") =!= length(col("text")).cast("long")).count() == 0)
  }

  test("perturb mode: embeddings keep dimension and stay within jitter band") {
    val stride = base("embeddings").agg(max(col("vec_id"))).head.getLong(0) + 1
    val basePairs = base("embeddings")
      .select(col("vec_id").as("base_id"), col("embedding").as("base_emb"))
    val copy1 = perturbed("embeddings")
      .filter(col("vec_id") >= stride && col("vec_id") < 2 * stride)
      .withColumn("base_id", col("vec_id") - stride)
      .join(basePairs, "base_id")
    // element-wise |delta| <= 0.01 and at least one element moved
    val audit = copy1.select(
      expr("aggregate(zip_with(embedding, base_emb, (a, b) -> abs(a - b)), 0D, (acc, d) -> greatest(acc, cast(d as double)))").as("max_d"),
      expr("size(embedding)").as("dim"), expr("size(base_emb)").as("base_dim"))
    assert(audit.filter(col("dim") =!= col("base_dim")).count() == 0)
    assert(audit.filter(col("max_d") > 0.0101).count() == 0, "jitter exceeded ±1% band")
    assert(audit.filter(col("max_d") > 0.0).count() > 0, "no embedding was jittered")
  }

  test("per-user event counts are scale-invariant (state bounds scale in users, not list length)") {
    val baseMax = base("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    val scaledMax = scaled("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    assert(scaledMax == baseMax,
      s"hot users must not get hotter: base $baseMax, scaled $scaledMax")
  }
}
