package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Properties pinning the zone-map layer's one inviolable contract —
  * pruning is INVISIBLE: for any data distribution (including
  * supplementary-plane strings, where parquet's UTF-8 byte order and
  * Java's UTF-16 order disagree — the round-5 demotion fix) and any
  * range predicate, the pruned read returns exactly the plain read's
  * rows. Each case writes real parquet and harvests real footer stats,
  * so the whole chain (stats → manifest → selectFiles → scan) is under
  * test, not just the comparison arithmetic.
  */
object ZoneMapsPropertySpec extends Properties("zonemaps") {

  // every case writes + reads a real parquet dir: keep the count modest
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  // strings mixing ASCII with BMP-accented and supplementary-plane
  // (emoji) characters — the corpus shape that broke string pruning
  private val charPool: Gen[String] =
    Gen.oneOf("a", "B", "z", "0", "~", "é", "ß", "😀", "🤖")
  private val strGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, charPool).map(_.mkString))

  private val longData: Gen[(List[Long], Long, Long)] = for {
    vals <- Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
    a <- Gen.choose(-1200L, 1200L)
    b <- Gen.choose(-1200L, 1200L)
  } yield (vals, math.min(a, b), math.max(a, b))

  private val strData: Gen[(List[String], String, String)] = for {
    vals <- Gen.nonEmptyListOf(strGen)
    a <- strGen
    b <- strGen
  } yield (vals, if (a <= b) a else b, if (a <= b) b else a)

  property("readPruned == plain filter for ANY long data + range") =
    Prop.forAll(longData) { case (vals, lo, hi) =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("zmprop").toString
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "v")
        .repartitionByRange(math.min(4, vals.size), col("v"))
      ZoneMaps.writeWithZoneMap(df, path, Seq("v"))
      val expected = spark.read.parquet(path)
        .filter(col("v") >= lo && col("v") <= hi)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = ZoneMaps.readPruned(spark, path,
          Seq(ZoneMaps.ZoneFilter("v", Some(lo), Some(hi))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got == expected
    }

  property("FileIndex scan == plain scan for ANY string corpus + range (non-ASCII demotes, never drops)") =
    Prop.forAll(strData) { case (vals, lo, hi) =>
      import spark.implicits._
      val path = java.nio.file.Files.createTempDirectory("zmprop_s").toString
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "s")
        .repartitionByRange(math.min(4, vals.size), col("s"))
      ZoneMaps.writeWithZoneMap(df, path, Seq("s"))
      val expected = spark.read.parquet(path)
        .filter(col("s") >= lo && col("s") <= hi)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val got = ZoneMapFileIndex.read(spark, path)
        .filter(col("s") >= lo && col("s") <= hi)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      got == expected
    }
}
