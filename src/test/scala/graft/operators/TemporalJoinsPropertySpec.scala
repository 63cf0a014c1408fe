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
