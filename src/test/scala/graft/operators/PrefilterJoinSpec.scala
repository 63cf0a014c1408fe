package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefilterJoinSpec extends SparkSpec {

  test("bloomJoin == plain join on real tables (false positives invisible)") {
    val dir = "/root/testdata/sf0.001"
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val got = PrefilterJoin.bloomJoin(fact, dim, "l_orderkey", "o_orderkey", 10000L)
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    val want = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    assert(rowsOf(got) == rowsOf(want))
    assert(got.count() > 0)
  }

  test("the prefilter actually drops fact rows before the join") {
    import spark.implicits._
    val fact = spark.range(0, 10000).toDF("k")
    val dim = Seq(3L, 7L).toDF("d")
    val bloom = PrefilterJoin.bloomJoin(fact, dim, "k", "d", 10L, fpp = 0.001)
    assert(bloom.count() == 2)
    // count rows surviving the bloom alone (join removed): re-create the
    // filter the operator applies and measure selectivity
    val bf = dim.stat.bloomFilter("d", 10L, 0.001)
    val survivors = (0L until 10000L).count(bf.mightContainLong)
    assert(survivors < 100, s"bloom should cut ~all of 10k rows, kept $survivors")
  }

  test("auto-sized bloom (default expectedItems) stays selective where a stale fixed size saturates") {
    import spark.implicits._
    val fact = spark.range(0, 20000).toDF("k")
    val dim = (0L until 5000L).map(_ * 4).toDF("d") // 5k keys, every 4th
    // result parity with the plain join under auto sizing
    val got = PrefilterJoin.bloomJoin(fact, dim, "k", "d")
    assert(got.count() == 5000)
    // the scale trap itself, measured: a filter sized for 50 items over
    // 5k keys saturates (fpp → ~1, prefilter useless); sized from
    // dim.count() it keeps ~fpp selectivity on non-matching keys
    val stale = dim.stat.bloomFilter("d", 50L, 0.01)
    val auto = dim.stat.bloomFilter("d", 5000L, 0.01)
    val nonMatching = (1L until 20000L by 4) // no multiples of 4
    val staleKept = nonMatching.count(stale.mightContainLong)
    val autoKept = nonMatching.count(auto.mightContainLong)
    assert(staleKept > nonMatching.size / 2,
      s"undersized bloom should be saturated, kept only $staleKept of ${nonMatching.size}")
    assert(autoKept < nonMatching.size / 20,
      s"auto-sized bloom should cut non-matching keys, kept $autoKept of ${nonMatching.size}")
  }
}
