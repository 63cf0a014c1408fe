package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {

  private def listParquet(dir: String) =
    new java.io.File(dir).listFiles((_, n) => n.endsWith(".parquet")).toSeq

  /** One well-sized file plus several tiny appended ones — the shape an
    * incremental sink leaves behind.
    */
  private def fragmented(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("compaction").toString
    (1L to 100000L).map(i => (i, s"payload-$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (1 to 4).foreach { b =>
      (1L to 10L).map(i => (100000L * b + i, s"tail-$b-$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("compaction merges the small tail, preserves rows, leaves the big file alone") {
    val dir = fragmented()
    val before = spark.read.parquet(dir)
    val rowsBefore = rowsOf(before)
    val bigBefore = listParquet(dir).maxBy(_.length).getName

    val (compacted, written) = Compaction.compactSmallFiles(spark, dir,
      targetBytes = 1L << 20, smallThreshold = 100L << 10)
    assert(compacted == 4 && written == 1, s"got ($compacted, $written)")

    val after = listParquet(dir)
    assert(after.map(_.getName).contains(bigBefore), "well-sized file must be untouched")
    assert(after.length == 2, s"expected big + 1 compacted, got ${after.map(_.getName)}")
    assert(rowsOf(spark.read.parquet(dir)) == rowsBefore, "compaction must not change rows")
  }

  test("a single small file is not worth rewriting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compaction1").toString
    (1L to 5L).map(i => (i, "x")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    assert(Compaction.compactSmallFiles(spark, dir, 1L << 20) == ((0, 0)))
    assert(listParquet(dir).length == 1)
  }

  test("a leftover staging dir from a dead pass is discarded, then compaction proceeds") {
    val dir = fragmented()
    val rowsBefore = rowsOf(spark.read.parquet(dir))
    val stale = new java.io.File(s"$dir/_compact_tmp")
    assert(stale.mkdir())
    Files.writeString(stale.toPath.resolve("garbage.parquet"), "not parquet")
    val (compacted, _) = Compaction.compactSmallFiles(spark, dir,
      1L << 20, smallThreshold = 100L << 10)
    assert(compacted == 4)
    assert(!stale.exists(), "staging dir must be cleaned up")
    assert(rowsOf(spark.read.parquet(dir)) == rowsBefore)
  }

  test("crash after a partial output move (uncommitted): recovery undoes, no duplicates") {
    val dir = fragmented()
    val rowsBefore = rowsOf(spark.read.parquet(dir))
    // simulate a pass that died mid-step-3: originals in the undo log,
    // one output already renamed into the root (content = a duplicate of
    // a small file — exactly the state that double-counts without undo)
    val root = new java.io.File(dir)
    val smalls = root.listFiles((_, n) => n.endsWith(".parquet")).toSeq
      .sortBy(_.length).take(4)
    val trash = new java.io.File(root, "_compact_trash/deadpass")
    assert(trash.mkdirs())
    Files.copy(smalls.head.toPath,
      root.toPath.resolve("part-compacted-deadpass-0.parquet"))
    smalls.foreach(f => Files.move(f.toPath, trash.toPath.resolve(f.getName)))
    // directory now holds a duplicate; recovery inside the next pass must
    // delete the orphan output, restore the originals, then compact
    val (compacted, written) = Compaction.compactSmallFiles(spark, dir,
      1L << 20, smallThreshold = 100L << 10)
    assert(compacted == 4 && written == 1)
    assert(rowsOf(spark.read.parquet(dir)) == rowsBefore,
      "recovery must leave every row exactly once")
    assert(!new java.io.File(root, "_compact_trash").exists())
  }

  test("crash in the duplication window (outputs in, originals not yet trashed): recovery undoes") {
    val dir = fragmented()
    val rowsBefore = rowsOf(spark.read.parquet(dir))
    // outputs-first order: a pass can die with an output installed while
    // EVERY original is still in place — the marker dir exists but is
    // empty. A reader at this instant sees duplicated rows (never
    // missing ones); recovery must delete the orphan output and restore
    // nothing.
    val root = new java.io.File(dir)
    val smalls = root.listFiles((_, n) => n.endsWith(".parquet")).toSeq
      .sortBy(_.length).take(4)
    val trash = new java.io.File(root, "_compact_trash/deadpass")
    assert(trash.mkdirs())
    Files.copy(smalls.head.toPath,
      root.toPath.resolve("part-compacted-deadpass-0.parquet"))
    val (compacted, written) = Compaction.compactSmallFiles(spark, dir,
      1L << 20, smallThreshold = 100L << 10)
    assert(compacted == 4 && written == 1)
    assert(rowsOf(spark.read.parquet(dir)) == rowsBefore,
      "recovery must leave every row exactly once")
    assert(!new java.io.File(root, "_compact_trash").exists())
  }

  test("crash after the commit rename: recovery finishes cleanup, keeps the compacted data") {
    val dir = fragmented()
    Compaction.compactSmallFiles(spark, dir, 1L << 20, smallThreshold = 100L << 10)
    val rowsAfter = rowsOf(spark.read.parquet(dir))
    // simulate a committed pass whose trash deletion was interrupted:
    // a .deleting-<passId> dir holding stale originals must be finished
    // off, NOT restored (restoring would duplicate rows)
    val root = new java.io.File(dir)
    val deleting = new java.io.File(root, "_compact_trash/.deleting-deadpass")
    assert(deleting.mkdirs())
    Files.writeString(deleting.toPath.resolve("stale.parquet"), "leftover")
    val (compacted, _) = Compaction.compactSmallFiles(spark, dir,
      1L << 20, smallThreshold = 100L << 10)
    assert(compacted == 0, "nothing small remains after the first pass")
    assert(!new java.io.File(root, "_compact_trash").exists(),
      "committed trash must be finished, not restored")
    assert(rowsOf(spark.read.parquet(dir)) == rowsAfter)
  }
}
