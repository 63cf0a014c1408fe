package graft.operators

import graft.SparkSpec
import graft.expressions.Bitmap64
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  // deterministic key stream: clustered lows (exercise one chunk densely)
  // plus scattered highs and negatives (many sparse chunks)
  private def keys: Seq[Long] =
    (0L until 6000L) ++                       // chunk 0 dense (crosses 4096 promote)
      (0L until 500L).map(i => i * 70001L) ++ // scattered sparse chunks
      (1L to 50L).map(i => -i * 123457L) ++   // negative keys
      (0L until 6000L)                        // exact repeats — must not double-count

  test("Bitmap64: exact over promote boundary, negatives, repeats; wire roundtrip") {
    val sk = Bitmap64.empty()
    keys.foreach(Bitmap64.add(sk, _))
    val distinct = keys.toSet
    val bytes = Bitmap64.serialize(sk)
    assert(Bitmap64.cardinality(bytes) == distinct.size.toLong)
    // roundtrip re-serializes byte-identically (deterministic wire format)
    assert(java.util.Arrays.equals(Bitmap64.serialize(Bitmap64.deserialize(bytes)), bytes))
    // membership straight off the wire, present and absent, across chunk edges
    Seq(0L, 4095L, 4096L, 5999L, 70001L * 499, -123457L).foreach(v =>
      assert(Bitmap64.contains(bytes, v), s"expected present: $v"))
    Seq(6000L, 65536L * 3 + 1, -1L, 70001L * 500).foreach(v =>
      assert(!Bitmap64.contains(bytes, v), s"expected absent: $v"))
  }

  test("Bitmap64: merge of disjoint-and-overlapping sketches equals direct build") {
    val (a, b) = keys.splitAt(keys.length / 3) // uneven, overlapping content
    val skA = Bitmap64.empty(); a.foreach(Bitmap64.add(skA, _))
    val skB = Bitmap64.empty(); b.foreach(Bitmap64.add(skB, _))
    Bitmap64.mergeInto(skA, skB)
    val direct = Bitmap64.empty(); keys.foreach(Bitmap64.add(direct, _))
    assert(java.util.Arrays.equals(Bitmap64.serialize(skA), Bitmap64.serialize(direct)))
  }

  test("bitmapShards + bitmapRollup: exact distinct, merge == cold rebuild byte-for-byte") {
    import spark.implicits._
    val df = keys.zipWithIndex
      .map { case (k, i) => (s"g${i % 3}", s"d${i % 5}", k) }
      .toDF("grp", "shard", "key")
    val shards = Sketches.bitmapShards(df, Seq(col("grp"), col("shard")), col("key"))
    assert(shards.count() == 15) // 3 groups x 5 shards
    val rolled = Sketches.bitmapRollup(shards, Seq(col("grp")))
    val expected = df.groupBy("grp")
      .agg(countDistinct(col("key")).as("exact"),
        call_function("bitmap_build", col("key")).as("direct"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    rolled.collect().foreach { r =>
      val (exact, direct) = expected(r.getAs[String]("grp"))
      assert(r.getAs[Long]("n_distinct") == exact)
      assert(r.getAs[Long]("n_shards") == 5L)
      // the incremental union must be indistinguishable from a cold re-scan
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("sketch"), direct))
    }
  }

  test("bitmap_contains/bitmap_cardinality as SQL functions") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val row = Seq(1L, 5L, 100000L, 1L).toDF("k")
      .agg(call_function("bitmap_build", col("k")).as("sk"))
      .select(
        call_function("bitmap_cardinality", col("sk")).as("n"),
        call_function("bitmap_contains", col("sk"), lit(5L)).as("has5"),
        call_function("bitmap_contains", col("sk"), lit(6L)).as("has6"))
      .collect()(0)
    assert(row.getLong(0) == 3L && row.getBoolean(1) && !row.getBoolean(2))
  }

  test("hllShards + hllRollup: estimates within 2% of exact, rollup deterministic") {
    import spark.implicits._
    val df = (0L until 20000L).map(k => (s"s${k % 4}", k % 7001L)).toDF("shard", "key")
    def roll() = Sketches.hllRollup(
      Sketches.hllShards(df, Seq(col("shard"), (col("key") % 10).as("sub")), col("key")),
      Seq(col("shard"))).collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("approx_distinct"))).toMap
    val rolled = roll()
    val direct = df.groupBy("shard")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("key"), lit(12))).as("est"),
        countDistinct(col("key")).as("exact"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    direct.foreach { case (shard, (directEst, exact)) =>
      val est = rolled(shard)
      // both routes land within the lgK=12 error bar; they need NOT be
      // equal — a streamed sketch answers with the HIP estimator, a
      // unioned one with the composite estimate (registers merge
      // losslessly, the estimator changes)
      assert(math.abs(est - exact.toDouble) / exact < 0.02,
        s"union estimate $est vs exact $exact off by >2%")
      assert(math.abs(directEst - exact.toDouble) / exact < 0.02,
        s"direct estimate $directEst vs exact $exact off by >2%")
    }
    // merge order / partitioning must not change the answer
    assert(roll() == rolled)
  }
}
