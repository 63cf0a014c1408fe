package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshot tables with time travel — the Delta/Iceberg
  * primitive in its leanest crash-consistent form, built on the same
  * single FS primitive [[Compaction]] relies on (atomic rename; the
  * graftstore:// emulator provides it for the object-store path):
  *
  *  - layout: `path/v=N/` data directories + `path/_commits/N` marker
  *    files. A version EXISTS iff its marker exists;
  *  - commit protocol: write data to `path/_staging/N-<uuid>`, rename
  *    into place as `v=N`, then create the marker. A crash anywhere
  *    before the marker leaves an orphaned data directory readers never
  *    see — the invisible-until-committed contract;
  *  - readers resolve `latest` as max(committed N), or pin any
  *    committed N — time travel is just "read an older immutable
  *    snapshot". Snapshots are never mutated;
  *  - `rollback(v)` deletes markers above v — O(#versions) metadata
  *    ops, zero data movement, exactly how production table formats
  *    roll back. Orphaned data dirs are reclaimed by [[vacuum]]
  *    (separated on purpose: rollback is the emergency lever, vacuum
  *    the housekeeping pass).
  *
  * Concurrent WRITERS are last-marker-wins per version number (single
  * pipeline owner per table, the [[graft.pipeline.Orchestrator]]
  * contract); concurrent readers are always safe because data dirs are
  * immutable once the marker lands.
  *
  * Scale shape: metadata ops are O(#versions) tiny files; data moves
  * once (the staging rename is a metadata op on HDFS/graftstore). Each
  * snapshot is a normal parquet directory — zone maps, bloom options,
  * and compaction compose per-snapshot.
  */
object VersionedTable {

  private val CommitsDir = "_commits"
  private val StagingDir = "_staging"

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Committed version numbers, ascending (empty when the table doesn't
    * exist yet).
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, path)
    val commits = new Path(root, CommitsDir)
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .sorted
  }

  /** Write `df` as the next snapshot and return its version number.
    * Data lands in staging, renames into place, and only then becomes
    * visible via the commit marker.
    */
  def write(spark: SparkSession, df: DataFrame, path: String): Long = {
    val (fs, root) = fsOf(spark, path)
    val next = versions(spark, path).lastOption.fold(0L)(_ + 1L)
    val staged = new Path(new Path(root, StagingDir),
      s"$next-${java.util.UUID.randomUUID.toString.take(8)}")
    df.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val dataDir = new Path(root, s"v=$next")
    val marker = new Path(new Path(root, CommitsDir), next.toString)
    // existence check BEFORE the rename: POSIX-style filesystems rename
    // INTO an existing directory (nesting the data) rather than failing.
    // An existing target is either a concurrent committer (marker
    // present — lose loudly) or an ORPHAN from a crashed or rolled-back
    // write (no marker — reclaim the slot)
    if (fs.exists(dataDir)) {
      require(!fs.exists(marker),
        s"version $next already committed at $path (concurrent writer)")
      fs.delete(dataDir, true)
    }
    require(fs.rename(staged, dataDir),
      s"commit rename failed for version $next at $path (concurrent writer?)")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false) // fail, don't clobber: first commit wins
    out.close()
    next
  }

  /** Read a committed snapshot — `version = None` resolves latest.
    * Reading an uncommitted or rolled-back version fails loudly.
    */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v is not committed at $path (committed: ${vs.mkString(",")})")
    spark.read.parquet(s"$path/v=$v")
  }

  /** Drop every version above `keep` — metadata-only, data dirs become
    * orphans until [[vacuum]].
    */
  def rollback(spark: SparkSession, path: String, keep: Long): Unit = {
    val (fs, root) = fsOf(spark, path)
    val vs = versions(spark, path)
    require(vs.contains(keep), s"cannot roll back to uncommitted version $keep")
    vs.filter(_ > keep).foreach { v =>
      fs.delete(new Path(new Path(root, CommitsDir), v.toString), false)
    }
  }

  /** Reclaim orphaned data: staging leftovers and data dirs whose
    * marker is gone (crashed writes, rolled-back versions). Returns the
    * number of directories removed.
    */
  def vacuum(spark: SparkSession, path: String): Int = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) return 0
    val committed = versions(spark, path).toSet
    var removed = 0
    val staging = new Path(root, StagingDir)
    if (fs.exists(staging)) {
      fs.listStatus(staging).foreach { s => fs.delete(s.getPath, true); removed += 1 }
    }
    fs.listStatus(root).foreach { s =>
      val name = s.getPath.getName
      if (name.startsWith("v=")) {
        val v = scala.util.Try(name.drop(2).toLong).toOption
        if (v.exists(!committed.contains(_))) { fs.delete(s.getPath, true); removed += 1 }
      }
    }
    removed
  }
}
