package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Property test: the union-sort-ffill as-of join agrees with an
  * independent in-memory reference (per-key sort + linear scan) on
  * randomized inputs — keys that exist on one side only, duplicate left
  * times, empty right sides, boundary-equal timestamps.
  */
object TemporalJoinsPropertySpec extends Properties("asof") {

  private lazy val spark = SparkSpec.session

  private val leftGen = Gen.listOf(Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 50L)))
  private val rightGen = Gen.listOf(
    Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 50L), Gen.choose(0.0, 100.0)))

  /** Reference semantics: latest right value with rt <= lt per key; ties
    * among right rows at the same rt resolve to the LAST in (rt, seq)
    * order, matching the operator's tie column.
    */
  private def expected(left: List[(Long, Long)], right: List[(Long, Long, Double)]): Map[(Long, Long, Int), Option[Double]] = {
    val byKey = right.zipWithIndex
      .map { case ((k, t, v), seq) => (k, t, seq, v) }
      .groupBy(_._1)
      .view.mapValues(_.sortBy(r => (r._2, r._3))).toMap
    left.zipWithIndex.map { case ((k, lt), i) =>
      val v = byKey.getOrElse(k, Nil).reverse.find(_._2 <= lt).map(_._4)
      (k, lt, i) -> v
    }.toMap
  }

  private val intervalGen = Gen.listOf(for {
    s <- Gen.choose(0L, 80L)
    len <- Gen.choose(1L, 25L)
    tag <- Gen.alphaLowerStr.map(_.take(4))
  } yield (s, s + len, tag))

  property("pointInIntervalJoin == naive inequality join for any bucket size") =
    Prop.forAllNoShrink(
      Gen.listOf(Gen.choose(0L, 120L)), intervalGen, Gen.choose(1L, 40L)) {
      (points, intervals, bucket) =>
        points.isEmpty || intervals.isEmpty || {
          import spark.implicits._
          val p = points.toDF("p")
          val iv = intervals.toDF("s", "e", "tag")
          val fast = TemporalJoins.pointInIntervalJoin(p, "p", iv, "s", "e", bucket)
            .select("p", "s", "tag").collect().map(_.toSeq).toList.sortBy(_.toString)
          val naive = p.join(iv, org.apache.spark.sql.functions.col("p") >= org.apache.spark.sql.functions.col("s") &&
              org.apache.spark.sql.functions.col("p") < org.apache.spark.sql.functions.col("e"))
            .select("p", "s", "tag").collect().map(_.toSeq).toList.sortBy(_.toString)
          fast == naive
        }
    }

  property("asofBackward == in-memory reference on random data") =
    Prop.forAllNoShrink(leftGen, rightGen) { (l, r) =>
      l.isEmpty || {
        import spark.implicits._
        // unique row id on the left distinguishes duplicate (k, t) rows
        val lDf = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }.toDF("k", "t", "row_id")
        val rDf = r.zipWithIndex.map { case ((k, t, v), seq) => (k, t, seq.toLong, v) }
          .toDF("k", "t", "seq", "v")
        val got = TemporalJoins.asofBackward(lDf, rDf, Seq("k"), "t", Seq("v"),
            tieCol = Some("seq"))
          .collect()
          .map(row => (row.getAs[Long]("k"), row.getAs[Long]("t"), row.getAs[Int]("row_id")) ->
            Option(row.getAs[Any]("asof_v")).map(_.asInstanceOf[Double]))
          .toMap
        val want = expected(l, r)
        got == want
      }
    }
}
