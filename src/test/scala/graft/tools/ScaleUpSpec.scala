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

  test("per-user event counts are scale-invariant (state bounds scale in users, not list length)") {
    val baseMax = base("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    val scaledMax = scaled("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    assert(scaledMax == baseMax,
      s"hot users must not get hotter: base $baseMax, scaled $scaledMax")
  }
}
