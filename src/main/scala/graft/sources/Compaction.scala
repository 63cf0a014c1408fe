package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet table directories — the
  * maintenance operator behind every long-lived appended dataset: a
  * stream of incremental writes (checkpointed scrapes, CDC batches,
  * per-shard sinks) accretes files far below the efficient scan size,
  * and at 100 TB the resulting footer-open and task-schedule overhead
  * dominates the read path. Compaction rewrites ONLY the undersized
  * files into ~`targetBytes` outputs and leaves well-sized files
  * untouched — unlike the S7 `files=` knob, which rewrites the whole
  * dataset to fix its tail.
  *
  * Crash consistency WITHOUT a table-format transaction log, built on
  * atomic rename (the one primitive local FS / HDFS give; object stores
  * need their own committer — see [[ObjectStore]]):
  *
  *  1. compacted outputs are written to `_compact_tmp`;
  *  2. `_compact_trash/<passId>/` is created — the in-progress marker
  *     and undo log;
  *  3. outputs rename into the root as `part-compacted-<passId>-…`
  *     BEFORE any original moves — a concurrent reader may transiently
  *     see compacted rows twice, but never sees rows missing;
  *  4. the small originals move into the trash dir — an UNDO LOG, not
  *     a delete;
  *  5. the trash dir renames to `.deleting-<passId>` — THE COMMIT
  *     POINT, one atomic rename — and is then deleted, with `_compact_tmp`
  *     last.
  *
  * Reader visibility during a pass: rows of the compacted set can be
  * DUPLICATED (between steps 3 and 5) but never absent — the
  * outputs-first order trades the missing-rows window a trash-first
  * order would have for a duplication window, the conservative failure
  * for maintenance-time scans. Readers needing exact results must
  * still be excluded for the duration of the pass.
  *
  * Recovery (runs automatically at the start of every pass): a trash
  * dir still named `<passId>` means the pass never committed — restore
  * any trashed originals, THEN delete any `part-compacted-<passId>-…`
  * outputs that made it to the root (originals-first keeps the
  * duplication-not-absence reader guarantee through recovery itself),
  * and the directory is byte-for-byte back to its pre-pass state (both
  * orders of interrupted step 3/4 heal with the same two moves). A `.deleting-<passId>` dir means the pass
  * committed and only the cleanup was interrupted — finish deleting it.
  * Either way no row is ever lost or duplicated after recovery.
  * Single-WRITER per directory is the caller's contract (concurrent
  * passes would race the shared staging dirs), same as any log-less
  * table maintenance.
  */
object Compaction {

  private val TmpDir = "_compact_tmp"
  private val TrashDir = "_compact_trash"

  /** One compaction pass (after healing any crashed predecessor).
    * Files smaller than `smallThreshold` (default targetBytes/2) are
    * read back and rewritten as ceil(totalBytes / targetBytes) outputs;
    * everything else is untouched. Returns (filesCompacted,
    * filesWritten) — (0, 0) when fewer than two small files exist,
    * because rewriting one file buys nothing.
    */
  def compactSmallFiles(spark: SparkSession, dir: String, targetBytes: Long,
                        smallThreshold: Long = 0L): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val threshold = if (smallThreshold > 0) smallThreshold else targetBytes / 2
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, root)
    val result = pass(spark, fs, root, dir, targetBytes, threshold)
    // zone-map manifest maintenance, AFTER the commit point: compacted
    // outputs get their footer stats re-harvested so skipping survives
    // compaction. A crash anywhere before this line leaves the manifest
    // stale but the reads correct (rewritten files unmapped => KEPT;
    // see ZoneMaps.refreshManifest), and the next pass's refresh —
    // which runs even when nothing was compacted — repairs skipping.
    ZoneMaps.refreshManifest(spark, dir)
    result
  }

  private def pass(spark: SparkSession, fs: FileSystem, root: Path, dir: String,
                   targetBytes: Long, threshold: Long): (Int, Int) = {
    val small = Tables.parquetDataFiles(spark, dir)._2.filter(_.getLen < threshold)
    if (small.length < 2) return (0, 0)
    val passId = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new Path(root, TmpDir)
    val trash = new Path(new Path(root, TrashDir), passId)

    val totalBytes = small.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(small.map(_.getPath.toString): _*)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    // in-progress marker first, then outputs INTO the root, then the
    // originals OUT: a concurrent reader between the two bulk moves sees
    // compacted rows twice (outputs + not-yet-trashed originals), never
    // a gap — see the reader-visibility note in the object doc
    fs.mkdirs(trash)
    val moved = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.map { case (st, i) =>
        val dest = new Path(root, s"part-compacted-$passId-$i.parquet")
        require(fs.rename(st.getPath, dest), s"rename failed: ${st.getPath} -> $dest")
        dest
      }
    // undo log: originals move (atomic renames), nothing is deleted yet
    small.foreach { st =>
      require(fs.rename(st.getPath, new Path(trash, st.getPath.getName)),
        s"rename to trash failed: ${st.getPath}")
    }
    // commit point: one atomic rename flips the pass from "undoable"
    // to "committed, cleanup pending"
    val deleting = new Path(trash.getParent, s".deleting-$passId")
    require(fs.rename(trash, deleting), s"commit rename failed: $trash")
    fs.delete(deleting, true)
    if (fs.listStatus(trash.getParent).isEmpty) fs.delete(trash.getParent, false)
    fs.delete(tmp, true)
    (small.length, moved.length)
  }

  /** Heal whatever a crashed pass left behind; see the object doc for
    * the case analysis. Idempotent; safe on a clean directory.
    */
  private def recover(fs: FileSystem, root: Path): Unit = {
    val trashRoot = new Path(root, TrashDir)
    if (fs.exists(trashRoot)) {
      fs.listStatus(trashRoot).filter(_.isDirectory).foreach { d =>
        val name = d.getPath.getName
        if (name.startsWith(".deleting-")) {
          // committed, cleanup interrupted — finish it
          fs.delete(d.getPath, true)
        } else {
          // uncommitted: undo — originals FIRST, outputs second, the
          // same duplication-not-absence order as the forward path: a
          // reader (or a second crash) between the two loops sees
          // restored originals alongside not-yet-deleted outputs, never
          // a gap. Outputs of this pass are identifiable by name.
          fs.listStatus(d.getPath).foreach { st =>
            require(fs.rename(st.getPath, new Path(root, st.getPath.getName)),
              s"recovery restore failed: ${st.getPath}")
          }
          fs.listStatus(root)
            .filter(st => st.isFile &&
              st.getPath.getName.startsWith(s"part-compacted-$name-"))
            .foreach(st => fs.delete(st.getPath, false))
          fs.delete(d.getPath, false)
        }
      }
      if (fs.listStatus(trashRoot).isEmpty) fs.delete(trashRoot, false)
    }
    val tmp = new Path(root, TmpDir)
    // with no surviving trash entry every pass is either committed or
    // fully undone — staging leftovers are never authoritative
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }
}
