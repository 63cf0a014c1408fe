package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests pinning the round-4 ordered/temporal operators to
  * brute-force reference implementations over random inputs — the
  * operators' one-shuffle compositions (union-scan as-of, sorted-fold
  * funnel, deletion-neighborhood blocking) must agree with the obvious
  * O(n²) definitions on ANY data, not just the fixtures. Raw ScalaCheck
  * `Properties` (same harness note as ParserPropertySpec).
  */
object TemporalPropertySpec extends Properties("temporal") {

  // each case spins several real Spark jobs; 25 random datasets per
  // property (× 3 directions / 2 distances inside) is plenty of space
  // without dominating suite wall time
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val smallLong = Gen.choose(0L, 40L)

  // ---- as-of joins vs brute force ---------------------------------

  private val asofData: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] = for {
    lefts <- Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), smallLong))
    rights <- Gen.listOfN(10, Gen.zip(Gen.choose(1L, 3L), smallLong, Gen.choose(0L, 9L)))
  } yield (lefts, rights.map { case (k, t, v) => (k, t, v) })

  private def bruteAsof(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long, Long)],
                        dir: String): Map[(Long, Long), Option[Long]] =
    lefts.map { case (k, t) =>
      val cands = rights.filter(_._1 == k)
      val pick = dir match {
        case "backward" =>
          val c = cands.filter(_._2 <= t)
          // last in (time, value-as-tie) order wins among equal times
          if (c.isEmpty) None else Some(c.maxBy(r => (r._2, r._3))._3)
        case "forward" =>
          val c = cands.filter(_._2 >= t)
          // first in tie order wins: minimize (time, tie)
          if (c.isEmpty) None else Some(c.minBy(r => (r._2, r._3))._3)
        case "nearest" =>
          val b = cands.filter(_._2 <= t).sortBy(r => (r._2, r._3)).lastOption
          val f = cands.filter(_._2 >= t).sortBy(r => (r._2, r._3)).headOption
          (b, f) match {
            case (Some(bb), Some(ff)) =>
              if (t - bb._2 <= ff._2 - t) Some(bb._3) else Some(ff._3)
            case (Some(bb), None) => Some(bb._3)
            case (None, Some(ff)) => Some(ff._3)
            case _ => None
          }
      }
      (k, t) -> pick
    }.toMap

  private def runAsof(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long, Long)],
                      dir: String): Map[(Long, Long), Option[Long]] = {
    // distinct left rows: duplicate (k, t) rows are legal input but make
    // the Map-keyed comparison ambiguous, so dedupe for the property
    val l = lefts.distinct.toDF("k", "t")
    val r = rights.toDF("k", "t", "v")
    val joined = dir match {
      case "backward" => TemporalJoins.asofBackward(l, r, Seq("k"), "t", Seq("v"), Some("v"))
      case "forward"  => TemporalJoins.asofForward(l, r, Seq("k"), "t", Seq("v"), Some("v"))
      case "nearest"  => TemporalJoins.asofNearest(l, r, Seq("k"), "t", Seq("v"), Some("v"))
    }
    joined.collect().map { row =>
      (row.getAs[Long]("k"), row.getAs[Long]("t")) ->
        Option(row.getAs[Any]("asof_v")).map(_.asInstanceOf[Long])
    }.toMap
  }

  property("asof joins == brute force in all three directions") =
    Prop.forAll(asofData) { case (lefts, rights) =>
      val ls = lefts.distinct
      Seq("backward", "forward", "nearest").forall { dir =>
        val got = runAsof(ls, rights, dir)
        val want = bruteAsof(ls, rights, dir)
        val ok = got == want
        if (!ok) println(s"[prop] dir=$dir\n got=$got\n want=$want\n l=$ls\n r=$rights")
        ok
      }
    }

  // ---- funnel vs naive recomputation ------------------------------

  private val funnelData: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(20, Gen.zip(Gen.choose(1L, 4L), smallLong, Gen.oneOf("a", "b", "c", "x")))

  private def bruteFunnel(rows: Seq[(Long, Long, String)], steps: Seq[String]): Map[Int, Long] = {
    val byUser = rows.groupBy(_._1)
    val reached = byUser.values.map { evs =>
      val sorted = evs.map(e => (e._2, e._3)).sorted
      var stage = 0
      var lastT = Long.MinValue
      sorted.foreach { case (t, tp) =>
        if (stage < steps.length && tp == steps(stage) && (stage == 0 || t > lastT)) {
          stage += 1; lastT = t
        }
      }
      stage
    }
    // one row PER STAGE, zero-conversion stages included — the operator's
    // (and the q84 oracle's) contract
    (1 to steps.length).map(i => i -> reached.count(_ >= i).toLong).toMap
  }

  property("conversionFunnel == naive per-user greedy recomputation") =
    Prop.forAll(funnelData) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("user", "sec", "tp")
          .withColumn("ts", timestamp_seconds(col("sec")))
        val steps = Seq("a", "b", "c")
        val got = Funnel.conversionFunnel(df, "user", "ts", "tp", steps)
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
        val want = bruteFunnel(rows, steps)
        val ok = got == want
        if (!ok) println(s"[prop] funnel got=$got want=$want rows=$rows")
        ok
      }
    }

  // ---- fuzzy join vs brute force on adversarial short strings ------

  private val fuzzyData: Gen[List[String]] =
    Gen.listOfN(10, Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))

  property("editDistancePairs == brute-force Levenshtein at d=1,2") =
    Prop.forAll(fuzzyData) { strs =>
      val rows = strs.distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      rows.size < 2 || {
        def lev(a: String, b: String): Int = {
          val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0
          }
          for (i <- 1 to a.length; j <- 1 to b.length)
            d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
              d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
          d(a.length)(b.length)
        }
        val df = rows.toDF("id", "s")
        Seq(1, 2).forall { k =>
          val got = FuzzyJoin.editDistancePairs(df, "id", "s", k)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
          val want = (for {
            (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
            d = lev(sa, sb) if d <= k
          } yield (ia, ib, d.toLong)).toSet
          val ok = got == want
          if (!ok) println(s"[prop] fuzzy d=$k got=$got want=$want strs=$rows")
          ok
        }
      }
    }
}
