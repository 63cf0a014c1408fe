package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def full = {
    import spark.implicits._
    Seq(
      ("a", 1.0), ("a", 3.0), ("a", 5.0),
      ("b", 10.0), ("b", -2.0),
      ("c", 7.0)).toDF("k", "x")
  }

  test("snapshot + delta merge == cold recompute over the full data") {
    val cutA = full.filter(col("x") <= 3.0)  // "history"
    val cutB = full.filter(col("x") > 3.0)   // "delta"
    val merged = Incremental.mergeAdditive(
      Incremental.partialAgg(cutA, Seq("k"), Seq("x")),
      Incremental.partialAgg(cutB, Seq("k"), Seq("x")),
      Seq("k"), Seq("x"))
    val cold = Incremental.partialAgg(full, Seq("k"), Seq("x"))
    assert(rowsOf(merged) == rowsOf(cold))
  }

  test("keys only in the delta (or only in history) survive the merge") {
    import spark.implicits._
    val hist = Seq(("old", 1.0)).toDF("k", "x")
    val delta = Seq(("new", 2.0)).toDF("k", "x")
    val merged = Incremental.mergeAdditive(
      Incremental.partialAgg(hist, Seq("k"), Seq("x")),
      Incremental.partialAgg(delta, Seq("k"), Seq("x")),
      Seq("k"), Seq("x"))
    assert(merged.select("k").collect().map(_.getString(0)).toSet == Set("old", "new"))
  }

  test("retraction via negated measures keeps sum/count exact") {
    import spark.implicits._
    val hist = Seq(("a", 5.0), ("a", 3.0)).toDF("k", "x")
    // retract the 3.0 row: negate the measure, count as -1
    val snapshot = Incremental.partialAgg(hist, Seq("k"), Seq("x"))
    val retraction = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("a", -1L, -3.0, -1L, 3.0, 3.0)),
      snapshot.schema)
    val merged = Incremental.mergeAdditive(snapshot, retraction, Seq("k"), Seq("x"))
    val r = merged.collect()(0)
    assert(r.getAs[Long]("n_rows") == 1L)
    assert(r.getAs[Double]("x_sum") == 5.0)
    assert(r.getAs[Long]("x_cnt") == 1L)
    // documented limitation: min/max only widen under retraction
  }

  test("withAvg derives avg from partials; nulls counted correctly") {
    import spark.implicits._
    val df = Seq(("a", Some(2.0)), ("a", None), ("a", Some(4.0))).toDF("k", "x")
    val agg = Incremental.withAvg(Incremental.partialAgg(df, Seq("k"), Seq("x")), Seq("x"))
    val r = agg.collect()(0)
    assert(r.getAs[Long]("n_rows") == 3L)     // count(*) counts null rows
    assert(r.getAs[Long]("x_cnt") == 2L)      // count(x) does not
    assert(r.getAs[Double]("x_avg") == 3.0)   // sum/cnt ignores the null
  }

  test("merge is one hash aggregation: no extra shuffle beyond the group-by") {
    val merged = Incremental.mergeAdditive(
      Incremental.partialAgg(full, Seq("k"), Seq("x")),
      Incremental.partialAgg(full, Seq("k"), Seq("x")),
      Seq("k"), Seq("x"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    // exchanges: one per partialAgg input + one for the merge group-by —
    // but never a join, sort, or window
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"))
  }

  test("joinDelta: old join + delta rows == full recompute, delta terms disjoint") {
    import spark.implicits._
    val oldA = Seq((1L, "k1"), (2L, "k2"), (3L, "k1")).toDF("aid", "k")
    val dA = Seq((4L, "k2"), (5L, "k3")).toDF("aid", "k")
    val oldB = Seq(("k1", 10L), ("k2", 20L)).toDF("k", "bval")
    val dB = Seq(("k1", 11L), ("k3", 30L)).toDF("k", "bval")
    val delta = Incremental.joinDelta(oldA, dA, oldB, dB, Seq("k"))
      .select("aid", "k", "bval")
    val full = oldA.unionByName(dA).join(oldB.unionByName(dB), Seq("k"))
      .select("aid", "k", "bval")
    val oldJoin = oldA.join(oldB, Seq("k")).select("aid", "k", "bval")
    val rows = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(rows(oldJoin) ++ rows(delta) == rows(oldJoin) ++ rows(delta))
    assert((rows(oldJoin) ++ rows(delta)).sorted == rows(full),
      "materialized old join plus the delta must equal the full recompute")
    // no row of the delta was already in the old join (appends only)
    assert(rows(delta).toSet.intersect(rows(oldJoin).toSet).isEmpty)
  }

  test("dedupDelta: fold-left admission over id-ordered batches == cold min-id dedup") {
    import spark.implicits._
    // fingerprints: f1 dups across batches, f2 dups within batch 2,
    // f3/f4 singletons
    val rows = Seq((1L, "f1"), (2L, "f3"), (3L, "f1"),
      (4L, "f2"), (5L, "f2"), (6L, "f4"))
    val all = rows.toDF("id", "fp")
    val batch1 = all.filter(col("id") <= 3)
    val batch2 = all.filter(col("id") > 3)
    val a1 = Incremental.dedupDelta(batch1, all.select(col("fp")).limit(0), "id", "fp")
    val a2 = Incremental.dedupDelta(batch2, a1.select(col("fp")), "id", "fp")
    val incremental = a1.unionByName(a2)
      .collect().map(r => (r.getLong(1), r.getString(0))).sorted.toSeq
    val cold = all.groupBy(col("fp")).agg(min(col("id")).as("id"))
      .collect().map(r => (r.getLong(1), r.getString(0))).sorted.toSeq
    assert(incremental == cold,
      s"fold-left admission must equal the cold recompute: $incremental vs $cold")
    assert(incremental.map(_._1) == Seq(1L, 2L, 4L, 6L))
  }
}
