package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZoneMapsSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("zonemaps").toString

  /** Range-clustered write: repartitionByRange gives each file a tight
    * id range — the layout zone maps exist to exploit.
    */
  private def clustered(path: String) = {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i.toDouble / 10, s"s${"%04d".format(i)}"))
      .toDF("id", "score", "name")
      .repartitionByRange(4, col("id"))
    ZoneMaps.writeWithZoneMap(df, path, Seq("id", "score", "name"))
  }

  test("manifest records typed per-file bounds that cover the data") {
    val path = tmp()
    val manifest = clustered(path)
    val rows = manifest.collect()
    assert(rows.map(_.getAs[String]("file")).distinct.length == 4)
    val idRows = rows.filter(_.getAs[String]("col") == "id")
    assert(idRows.forall(_.getAs[String]("kind") == "long"))
    assert(idRows.map(_.getAs[Long]("min_long")).min == 1L)
    assert(idRows.map(_.getAs[Long]("max_long")).max == 1000L)
    val scoreRows = rows.filter(_.getAs[String]("col") == "score")
    assert(scoreRows.forall(_.getAs[String]("kind") == "double"))
    val nameRows = rows.filter(_.getAs[String]("col") == "name")
    assert(nameRows.forall(_.getAs[String]("kind") == "string"))
  }

  test("selectFiles prunes disjoint files, keeps overlapping ones") {
    val path = tmp()
    val manifest = clustered(path)
    val all = ZoneMaps.selectFiles(manifest, Nil)
    assert(all.length == 4)
    // a narrow id range lands in one or two of the four range files
    val narrow = ZoneMaps.selectFiles(manifest,
      Seq(ZoneMaps.ZoneFilter("id", Some(100L), Some(120L))))
    assert(narrow.nonEmpty && narrow.length < all.length,
      s"expected pruning, kept $narrow of $all")
    // an impossible range prunes everything
    assert(ZoneMaps.selectFiles(manifest,
      Seq(ZoneMaps.ZoneFilter("id", Some(5000L), None))).isEmpty)
  }

  test("readPruned returns exactly the predicate rows — pruning is invisible") {
    val path = tmp()
    clustered(path)
    val expected = spark.read.parquet(path)
      .filter(col("id") >= 250L && col("id") <= 300L)
    val pruned = ZoneMaps.readPruned(spark, path,
      Seq(ZoneMaps.ZoneFilter("id", Some(250L), Some(300L))))
    assert(rowsOf(pruned) == rowsOf(expected))
    assert(pruned.count() == 51)
  }

  test("multi-column filters intersect; string bounds prune too") {
    val path = tmp()
    val manifest = clustered(path)
    val kept = ZoneMaps.selectFiles(manifest, Seq(
      ZoneMaps.ZoneFilter("id", Some(1L), Some(500L)),
      ZoneMaps.ZoneFilter("name", Some("s0900"), None)))
    // id <= 500 keeps the lower files, name >= s0900 keeps the upper —
    // the intersection is empty or a single boundary file
    assert(kept.isEmpty || kept.length == 1, s"expected disjoint prune, kept $kept")
    val got = ZoneMaps.readPruned(spark, path, Seq(
      ZoneMaps.ZoneFilter("score", Some(10.0), Some(12.0))))
    assert(got.count() == 21) // ids 100..120
  }

  test("z-order clustering + zone maps: BOTH dimensions prune files from one layout") {
    import spark.implicits._
    import graft.operators.Layout
    // 32x32 grid; z-order interleaving gives files locality in x AND y,
    // so zone maps prune on either column from the same clustered write
    val path = tmp()
    val df = (0L until 32L).flatMap(x => (0L until 32L).map(y => (x, y)))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue2(col("x"), col("y"), bits = 8))
      .repartitionByRange(16, col("z"))
      .drop("z")
    val manifest = ZoneMaps.writeWithZoneMap(df, path, Seq("x", "y"))
    val all = ZoneMaps.selectFiles(manifest, Nil)
    val xPruned = ZoneMaps.selectFiles(manifest,
      Seq(ZoneMaps.ZoneFilter("x", Some(0L), Some(3L))))
    val yPruned = ZoneMaps.selectFiles(manifest,
      Seq(ZoneMaps.ZoneFilter("y", Some(28L), Some(31L))))
    assert(xPruned.length < all.length, s"x-range should prune: ${xPruned.length}/${all.length}")
    assert(yPruned.length < all.length, s"y-range should prune: ${yPruned.length}/${all.length}")
    // correctness through the pruned read on the second dimension
    val got = ZoneMaps.readPruned(spark, path,
      Seq(ZoneMaps.ZoneFilter("y", Some(28L), Some(31L))))
    assert(got.count() == 32 * 4)
  }

  test("an empty prune still returns the correct (empty) frame with the right schema") {
    val path = tmp()
    clustered(path)
    val got = ZoneMaps.readPruned(spark, path,
      Seq(ZoneMaps.ZoneFilter("id", Some(9999L), None)))
    assert(got.columns.toSeq == Seq("id", "score", "name"))
    assert(got.count() == 0)
  }
}
