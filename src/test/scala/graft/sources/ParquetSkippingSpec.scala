package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet-native footer skipping ([[Tables.write]]'s bloomFilterCols):
  * the first line of defense at 100 TB, below any custom FileIndex —
  * an equality probe for an absent key must be answered by footer
  * metadata (bloom filter), not by scanning data pages.
  *
  * The fixture is built so the OTHER two parquet pruning mechanisms
  * cannot fire and the bloom is load-bearing: keys are `id * 2`
  * (probe = an odd value inside [min, max] ⇒ row-group stats can't
  * prune) and high-cardinality (200k distinct longs overflow the 1 MB
  * dictionary page ⇒ parquet falls back to plain encoding and
  * dictionary filtering is unavailable — exactly the regime real
  * join/lookup keys live in).
  */
class ParquetSkippingSpec extends SparkSpec {

  private val n = 200000L

  private def fixture = spark.range(n)
    .select((col("id") * 2).as("k"), col("id").as("v"))

  /** rows the parquet scan node emitted for the probe query — i.e. rows
    * surviving row-group-level pruning (stats/dictionary/bloom), before
    * Spark's post-scan Filter
    */
  private def recordsRead(path: String, probe: Long): Long = {
    val df = spark.read.parquet(path).filter(col("k") === lit(probe))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("bloomFilterCols writes a bloom filter into the footer metadata") {
    val dir = Files.createTempDirectory("bloom_footer").toString
    Tables.write(fixture, dir, files = 1, bloomFilterCols = Seq("k"))
    val conf = spark.sparkContext.hadoopConfiguration
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val hasBloom = Tables.withFooter(conf,
        new org.apache.hadoop.fs.Path(part.getAbsolutePath)) { r =>
      val cols = r.getRowGroups.get(0).getColumns
      (0 until cols.size()).exists { i =>
        val c = cols.get(i)
        c.getPath.toDotString == "k" && c.getBloomFilterOffset >= 0
      }
    }
    assert(hasBloom, "column k must carry a bloom filter offset in the footer")
  }

  test("absent-key probe: bloom skips the row group; without it the scan reads rows") {
    val withBloom = Files.createTempDirectory("bloom_on").toString
    val noBloom = Files.createTempDirectory("bloom_off").toString
    Tables.write(fixture, withBloom, files = 1, bloomFilterCols = Seq("k"))
    Tables.write(fixture, noBloom, files = 1)
    val probe = 100001L // odd ⇒ absent, but inside [0, 2n-2] ⇒ stats can't prune
    val readBloom = recordsRead(withBloom, probe)
    val readPlain = recordsRead(noBloom, probe)
    assert(readBloom == 0L,
      s"bloom must skip every row group for an absent key, read $readBloom rows")
    assert(readPlain > 0L,
      "without a bloom the reader must actually scan (fixture defeats " +
        s"stats and dictionary pruning), read $readPlain rows")
  }

  test("present-key probe through a bloom still returns the row (no false negatives)") {
    val dir = Files.createTempDirectory("bloom_hit").toString
    Tables.write(fixture, dir, files = 1, bloomFilterCols = Seq("k"))
    val got = spark.read.parquet(dir).filter(col("k") === lit(100000L))
      .select("v").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(50000L))
  }
}
