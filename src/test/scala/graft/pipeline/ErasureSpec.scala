package graft.pipeline

import graft.SparkSpec
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

class ErasureSpec extends SparkSpec {

  test("erase removes subjects across the scope, commits snapshots, audits truthfully") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("gdpr").toString
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("uid", "name")
    val acts = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 4L)).toDF("act_id", "uid")
    val subjects = Seq(1L, 3L).toDF("uid")
    val audit = Erasure.erase(spark, subjects, "uid", Seq(
        Erasure.Scope("users", users, "uid"),
        Erasure.Scope("activity", acts, "uid")), base)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(audit("users") == (4L, 2L, 2L, 0L))
    assert(audit("activity") == (4L, 2L, 2L, 0L))
    // the committed snapshots really exclude the subjects
    val keptUsers = VersionedTable.read(spark, s"$base/users")
      .select("uid").collect().map(_.getLong(0)).toSet
    assert(keptUsers == Set(2L, 4L))
    val keptActs = VersionedTable.read(spark, s"$base/activity")
      .select("uid").collect().map(_.getLong(0)).toSet
    assert(keptActs == Set(2L, 4L))
  }

  test("repeat erasure appends a new version — the audit trail accumulates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("gdpr2").toString
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "name")
    Erasure.erase(spark, Seq(1L).toDF("uid"), "uid",
      Seq(Erasure.Scope("users", users, "uid")), base)
    val second = Erasure.erase(spark,
      Seq(2L).toDF("uid"), "uid",
      Seq(Erasure.Scope("users",
        VersionedTable.read(spark, s"$base/users"), "uid")), base)
      .collect()(0)
    assert(second.getLong(4) == 1L, "second erasure commits as version 1")
    // time travel shows the estate at each erasure step
    assert(VersionedTable.read(spark, s"$base/users", Some(0L)).count() == 2L)
    assert(VersionedTable.read(spark, s"$base/users", Some(1L)).count() == 1L)
  }
}
