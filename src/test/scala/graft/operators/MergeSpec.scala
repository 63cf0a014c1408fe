package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, 10L, "upsert", "v1"), (2L, 10L, "upsert", "v2"),
      (3L, 10L, "upsert", "v3")).toDF("key", "version", "op", "payload")
  }

  test("upsert: latest version wins; unchanged keys survive") {
    import spark.implicits._
    val changes = Seq((1L, 20L, "upsert", "v1b"), (4L, 5L, "upsert", "v4"))
      .toDF("key", "version", "op", "payload")
    val got = Merge.upsert(base, changes, Seq("key"), "version", "payload")
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "v1b"), (2L, "v2"), (3L, "v3"), (4L, "v4")))
  }

  test("version ties break deterministically on tieBreak desc") {
    import spark.implicits._
    val changes = Seq((2L, 10L, "upsert", "v2z"), (2L, 10L, "upsert", "v2a"))
      .toDF("key", "version", "op", "payload")
    val got = Merge.upsert(base, changes, Seq("key"), "version", "payload")
      .filter(col("key") === 2L).collect()
    assert(got.length == 1 && got(0).getString(3) == "v2z")
  }

  test("scd2: consecutive identical values collapse; intervals chain; last is current") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, 1L, "gold"),   // opens v1
      (1L, 200L, 2L, "gold"),   // no-op change — collapsed
      (1L, 300L, 3L, "silver"), // opens v2, closes v1 at 300
      (2L, 150L, 4L, "bronze")  // single-version key
    ).toDF("key", "ts", "seq", "tier")
    val got = Merge.scd2(log, Seq("key"), "ts", "seq", Seq("tier"))
      .orderBy("key", "valid_from")
      .select("key", "tier", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "gold", 100L, Some(300L), false),
      (1L, "silver", 300L, None, true),
      (2L, "bronze", 150L, None, true)))
  }

  test("scd2: null-safe change detection — null==null is no change, null→value is") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, 1L, null.asInstanceOf[String]),
      (1L, 200L, 2L, null.asInstanceOf[String]), // null → null: collapsed
      (1L, 300L, 3L, "a")                        // null → a: new version
    ).toDF("key", "ts", "seq", "tier")
    val got = Merge.scd2(log, Seq("key"), "ts", "seq", Seq("tier"))
      .orderBy("valid_from").select("tier", "valid_from").collect()
    assert(got.length == 2)
    assert(got(0).isNullAt(0) && got(0).getLong(1) == 100L)
    assert(got(1).getString(0) == "a" && got(1).getLong(1) == 300L)
  }

  test("scd2: same-timestamp ties order by tieBreak; earlier tie becomes zero-length") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, 1L, "a"),
      (1L, 100L, 2L, "b") // same ts, later seq: wins; 'a' is zero-length
    ).toDF("key", "ts", "seq", "tier")
    val got = Merge.scd2(log, Seq("key"), "ts", "seq", Seq("tier"))
      .orderBy("valid_from", "seq")
      .select("tier", "valid_from", "valid_to", "is_current").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a" && got(0).getLong(2) == 100L && !got(0).getBoolean(3))
    assert(got(1).getString(0) == "b" && got(1).isNullAt(2) && got(1).getBoolean(3))
  }

  test("scd2 plans a single exchange for both window passes") {
    import spark.implicits._
    val log = Seq((1L, 100L, 1L, "a")).toDF("key", "ts", "seq", "tier")
    val plan = Merge.scd2(log, Seq("key"), "ts", "seq", Seq("tier"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected 1 exchange:\n$plan")
  }

  test("applyChangelog: a trailing delete tombstones the key entirely") {
    import spark.implicits._
    val changes = Seq(
      (2L, 20L, "delete", ""),           // delete AFTER the base upsert
      (3L, 5L, "delete", ""),            // stale delete: base v10 wins
      (5L, 1L, "delete", "")             // delete of a never-seen key
    ).toDF("key", "version", "op", "payload")
    val got = Merge.applyChangelog(base, changes, Seq("key"), "version",
        "payload", "op", "delete")
      .orderBy("key").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "v1"), (3L, "v3")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged null-safely") {
    import spark.implicits._
    val oldDf = Seq((1L, Option("a"), Option(1)), (2L, Option("b"), Option(2)),
      (3L, Option.empty[String], Option(3)), (4L, Option("d"), Option(4)))
      .toDF("k", "s", "v")
    val newDf = Seq((1L, Option("a"), Option(1)),   // unchanged
      (2L, Option("B"), Option(2)),                 // changed (s differs)
      (3L, Option.empty[String], Option(3)),        // unchanged — null <=> null
      (5L, Option("e"), Option(5)))                 // added; key 4 removed
      .toDF("k", "s", "v")
    val got = Merge.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }

  test("snapshotDiff: null -> value is changed; an all-null row classifies by presence") {
    import spark.implicits._
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val newDf = Seq((1L, Option("x"))).toDF("k", "s")
    val got = Merge.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s"))
      .select("k", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 2's only attribute is null on the old side — the presence
    // marker, not attribute nullability, must drive the classification
    assert(got == Map(1L -> "changed", 2L -> "removed"))
  }

  test("snapshotDiff rejects key/tracked overlap and old_/new_ name collisions") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(df, df, Seq("k"), Seq("k", "s"))
    }
    val clash = Seq((1L, "a", "b")).toDF("k", "s", "old_s")
    intercept[IllegalArgumentException] {
      Merge.snapshotDiff(clash, clash, Seq("k"), Seq("s", "old_s"))
    }
  }
}
