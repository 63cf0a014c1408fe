package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("vtable").toString + "/t"

  test("write/read: versions are immutable snapshots, latest wins by default") {
    import spark.implicits._
    val path = freshPath()
    val v0 = VersionedTable.write(spark, (1L to 5L).toDF("id"), path)
    val v1 = VersionedTable.write(spark, (1L to 9L).toDF("id"), path)
    assert(v0 == 0L && v1 == 1L)
    assert(VersionedTable.versions(spark, path) == Seq(0L, 1L))
    assert(VersionedTable.read(spark, path).count() == 9L)
    assert(VersionedTable.read(spark, path, Some(0L)).count() == 5L)
  }

  test("rollback is metadata-only; vacuum reclaims the orphans; re-commit advances past them") {
    import spark.implicits._
    val path = freshPath()
    VersionedTable.write(spark, (1L to 3L).toDF("id"), path)
    VersionedTable.write(spark, (1L to 6L).toDF("id"), path)
    VersionedTable.write(spark, (1L to 12L).toDF("id"), path)
    VersionedTable.rollback(spark, path, keep = 0L)
    assert(VersionedTable.versions(spark, path) == Seq(0L))
    assert(VersionedTable.read(spark, path).count() == 3L)
    // rolled-back versions refuse to read
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(2L))
    }
    // data dirs still on disk (rollback moved no data) until vacuum
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(path, "v=2")))
    assert(VersionedTable.vacuum(spark, path) == 2)
    assert(!fs.exists(new Path(path, "v=1")) && !fs.exists(new Path(path, "v=2")))
    // next write does NOT reuse a rolled-back number's dir ambiguity:
    // it commits as 1 on a clean slate and reads back correctly
    val v = VersionedTable.write(spark, (1L to 4L).toDF("id"), path)
    assert(v == 1L && VersionedTable.read(spark, path).count() == 4L)
  }

  test("crash consistency: uncommitted data is invisible and vacuumable") {
    import spark.implicits._
    val path = freshPath()
    VersionedTable.write(spark, (1L to 3L).toDF("id"), path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash AFTER the data rename but BEFORE the marker:
    // a fully-formed v=1 directory with no commit record
    (1L to 99L).toDF("id").write.parquet(s"$path/v=1")
    // and a crash mid-write: staging leftovers
    (1L to 7L).toDF("id").write.parquet(s"$path/_staging/1-deadbeef")
    assert(VersionedTable.versions(spark, path) == Seq(0L), "orphans must be invisible")
    assert(VersionedTable.read(spark, path).count() == 3L)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(1L))
    }
    assert(VersionedTable.vacuum(spark, path) == 2)
    assert(!fs.exists(new Path(path, "v=1")))
    // recovery: the next committed write takes over version 1 cleanly
    assert(VersionedTable.write(spark, (1L to 11L).toDF("id"), path) == 1L)
    assert(VersionedTable.read(spark, path).count() == 11L)
  }

  test("write reclaims an orphaned data dir without vacuum (rollback then re-commit)") {
    import spark.implicits._
    val path = freshPath()
    VersionedTable.write(spark, (1L to 3L).toDF("id"), path)
    VersionedTable.write(spark, (1L to 6L).toDF("id"), path)
    VersionedTable.rollback(spark, path, keep = 0L)
    // v=1 data dir still on disk; the next write must take the slot over
    assert(VersionedTable.write(spark, (1L to 8L).toDF("id"), path) == 1L)
    assert(VersionedTable.read(spark, path).count() == 8L)
  }

  test("time travel composes with graftstore:// (object-store emulator)") {
    import spark.implicits._
    ObjectStore.configureLocalEmulator(spark)
    val path = "graftstore:" +
      java.nio.file.Files.createTempDirectory("vtable_gs").toString + "/t"
    VersionedTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    VersionedTable.write(spark, Seq((1L, "a2")).toDF("id", "s"), path)
    assert(VersionedTable.read(spark, path, Some(0L)).count() == 2L)
    assert(VersionedTable.read(spark, path).select("s").collect()(0).getString(0) == "a2")
  }

  test("empty table and bad reads fail loudly") {
    val path = freshPath()
    intercept[IllegalArgumentException] { VersionedTable.read(spark, path) }
    intercept[IllegalArgumentException] { VersionedTable.rollback(spark, path, 0L) }
    assert(VersionedTable.vacuum(spark, path) == 0)
  }
}
