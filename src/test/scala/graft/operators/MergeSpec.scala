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
}
