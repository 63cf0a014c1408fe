package graft.sources

import org.apache.hadoop.fs.Path
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
  * Crash contract (documented, not hidden): the sequence is write-new →
  * delete-old, so a failure between the two leaves BOTH copies and a
  * rerun would double-count — the same non-transactional window every
  * rename-based commit has without a table format's log. Run it under
  * [[graft.pipeline.Orchestrator]]'s idempotent completion marker (or
  * any external lock) exactly like the reference's overwrite jobs; on a
  * crash, the `_compact_tmp` staging dir's presence tells the rerun to
  * clean up and start over, never to trust a half-move.
  */
object Compaction {

  /** One compaction pass. Files smaller than `smallThreshold` (default
    * targetBytes/2) are read back and rewritten as ceil(totalBytes /
    * targetBytes) outputs; everything else is untouched. Returns
    * (filesCompacted, filesWritten) — (0, 0) when fewer than two small
    * files exist, because rewriting one file buys nothing.
    */
  def compactSmallFiles(spark: SparkSession, dir: String, targetBytes: Long,
                        smallThreshold: Long = 0L): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val threshold = if (smallThreshold > 0) smallThreshold else targetBytes / 2
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val tmp = new Path(root, "_compact_tmp")
    // a leftover staging dir means a previous pass died mid-move: its
    // contents were never authoritative (originals still present until
    // the delete phase), so discarding it is always safe
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val files = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val small = files.filter(_.getLen < threshold)
    if (small.length < 2) return (0, 0)

    val totalBytes = small.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(small.map(_.getPath.toString): _*)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    // move the compacted outputs in, then delete the originals — the
    // ordering that can duplicate on crash but never lose rows
    val moved = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.map { case (st, i) =>
        val dest = new Path(root, s"part-compacted-$i-${st.getPath.getName}")
        require(fs.rename(st.getPath, dest), s"rename failed: ${st.getPath} -> $dest")
        dest
      }
    small.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
    (small.length, moved.length)
  }
}
