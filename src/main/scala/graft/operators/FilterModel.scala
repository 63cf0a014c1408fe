package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of the corpus quality filter — full-batch
  * logistic regression by gradient descent over engine-computed text
  * features. The fastText/CCNet-style quality classifier every
  * LLM-data pipeline trains (label a slice, fit a linear model, score
  * the corpus) without leaving the engine. No reference counterpart
  * (SURVEY.md §7.4 LLM-pipeline category).
  *
  * Scale split (the k-means-centroid convention): the weight vector is
  * d+1 driver-held doubles; each GD step is ONE map-side-combined
  * scalar aggregate over the corpus (d+1 gradient means), so a 100 TB
  * training run costs `iterations` scans of a persisted feature
  * projection and shuffles nothing but d+1 doubles per step. A fixed
  * iteration count (not a convergence test) keeps the result exactly
  * restatable by an external engine as unrolled per-step CTEs.
  */
object FilterModel {

  /** Full-batch logistic-regression GD: minimize mean log-loss of
    * `labelCol` on `xCols` (+ an implicit bias term) with
    * w ← w − η·avg((σ(w·x) − y)·x), starting from w = 0.
    *
    * Rows with a null label or null feature are dropped (a linear
    * model is undefined on them). Output: one row per term — `bias`
    * first, then `xCols` in order — with the trained weight and the
    * final-epoch training metrics repeated on every row (the
    * [[Stats.calibration]] scalar convention):
    * (term, weight, n, accuracy, log_loss), weight/metrics at 6 dp.
    */
  def logisticGd(df: DataFrame, xCols: Seq[String], labelCol: String,
                 iterations: Int, learningRate: Double): DataFrame = {
    require(xCols.nonEmpty, "need at least one feature column")
    require(iterations >= 1, s"need >= 1 iterations, got $iterations")
    require(learningRate > 0, s"learningRate must be positive, got $learningRate")
    val spark = df.sparkSession
    val d = xCols.size
    val feats = df.select(
        col(labelCol).cast("boolean").cast("double").as("__y") +:
          xCols.zipWithIndex.map { case (c, i) =>
            col(c).cast("double").as(s"__x$i") }: _*)
      .filter((col("__y").isNotNull +:
        xCols.indices.map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
    // The numeric projection materializes ONCE as primitive [y, x0…]
    // rows; each GD step is then a single closure-aggregate job over
    // the cache. The former shape — a fresh SQL aggregate with the
    // step's weights baked in as literals — re-analyzed, re-optimized
    // and re-JIT-compiled a brand-new plan every step (the generated
    // source differs per weight vector, so the codegen cache never
    // hits): ~150 ms/step of pure planning overhead at sf0.1, ~7× the
    // actual gradient compute. Float semantics are unchanged — z stays
    // the left-associative bias + x0·w1 + …, σ the same Math.exp form,
    // per-partition partial sums accumulate in row order and the mean
    // divides the merged sum once, exactly like the SQL avg.
    val data = feats.queryExecution.toRdd.map { ir =>
      val a = new Array[Double](d + 1)
      var i = 0; while (i < d + 1) { a(i) = ir.getDouble(i); i += 1 }; a
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def sigma(a: Array[Double], w: Array[Double]): Double = {
        var z = w(0); var i = 0
        while (i < d) { z += a(i + 1) * w(i + 1); i += 1 }
        1.0 / (1.0 + math.exp(-z))
      }
      var w = Array.fill(d + 1)(0.0)
      for (_ <- 1 to iterations) {
        val (gsum, cnt) = data.aggregate((new Array[Double](d + 1), 0L))(
          seqOp = { case ((acc, c), a) =>
            val e = sigma(a, w) - a(0)
            acc(0) += e
            var i = 0
            while (i < d) { acc(i + 1) += e * a(i + 1); i += 1 }
            (acc, c + 1L)
          },
          combOp = { case ((a1, c1), (a2, c2)) =>
            var i = 0; while (i < d + 1) { a1(i) += a2(i); i += 1 }
            (a1, c1 + c2)
          })
        // empty input: no gradient, w stays put (the old null-avg read
        // back as 0.0 through Row.getDouble — same fixed point)
        if (cnt > 0)
          w = Array.tabulate(d + 1)(j => w(j) - learningRate * (gsum(j) / cnt))
      }
      // final-epoch metrics in one more pass, same formulas as the old
      // SQL aggregate. The loss clamps p away from {0, 1}: σ saturates
      // EXACTLY in double past |z| ≈ 37, and log(0) on a confidently-
      // correct row would bias the reported loss precisely when the
      // model fits well. 1e-15 is below any real probability of
      // interest and a no-op when σ is unsaturated.
      val (accSum, lossSum, n) = data.aggregate((0.0, 0.0, 0L))(
        seqOp = { case ((as, ls, c), a) =>
          val p = sigma(a, w)
          val y = a(0)
          val acc = if ((p >= 0.5) == (y == 1.0)) 1.0 else 0.0
          val pcl = math.max(math.min(p, 1.0 - 1e-15), 1e-15)
          val loss = -(y * math.log(pcl) + (1.0 - y) * math.log(1.0 - pcl))
          (as + acc, ls + loss, c + 1L)
        },
        combOp = { case ((a1, l1, c1), (a2, l2, c2)) =>
          (a1 + a2, l1 + l2, c1 + c2)
        })
      // round exactly like the Spark `round` column function (HALF_UP
      // on double); NaN/∞ pass through as round() passes them through
      def r6(x: Double): java.lang.Double =
        if (x.isNaN || x.isInfinite) x
        else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // n == 0: the old avg returned SQL null → null metrics columns
      val (accOut, lossOut): (java.lang.Double, java.lang.Double) =
        if (n == 0) (null, null) else (r6(accSum / n), r6(lossSum / n))
      import spark.implicits._
      ("bias" +: xCols).zip(w.toSeq).zipWithIndex
        .map { case ((t, wj), i) => (i.toLong, t, r6(wj), n, accOut, lossOut) }
        .toDF("term_idx", "term", "weight", "n", "accuracy", "log_loss")
    } finally data.unpersist(blocking = false)
  }
}
