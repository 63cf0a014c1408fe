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
    val feats = df.select(
        col(labelCol).cast("boolean").cast("double").as("__y") +:
          xCols.zipWithIndex.map { case (c, i) =>
            col(c).cast("double").as(s"__x$i") }: _*)
      .filter((col("__y").isNotNull +:
        xCols.indices.map(i => col(s"__x$i").isNotNull)).reduce(_ && _))
      .persist()
    graft.Caches.track(feats)
    val d = xCols.size
    // z built LEFT-ASSOCIATIVELY (bias + x0·w1 + x1·w2 + …) so an
    // external engine writing the sum in the same order folds the
    // identical float expression
    def zOf(w: Array[Double]): Column =
      xCols.indices.foldLeft(lit(w(0)): Column) { (acc, i) =>
        acc + col(s"__x$i") * lit(w(i + 1)) }
    def pOf(w: Array[Double]): Column = lit(1.0) / (lit(1.0) + exp(-zOf(w)))
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iterations) {
      val p = pOf(w)
      val grads = (lit(1.0) +: xCols.indices.map(i => col(s"__x$i"): Column))
        .zipWithIndex.map { case (xc, j) =>
          avg((p - col("__y")) * xc).as(s"__g$j") }
      val g = feats.agg(grads.head, grads.tail: _*).collect()(0)
      w = Array.tabulate(d + 1)(j => w(j) - learningRate * g.getDouble(j))
    }
    val p = pOf(w)
    // the loss clamps p away from {0, 1}: σ saturates EXACTLY in double
    // past |z| ≈ 37, and log(0) on a confidently-correct row would drop
    // it from the avg (or throw under ANSI) — biasing the reported loss
    // precisely when the model fits well. 1e-15 is below any real
    // probability of interest and a no-op when σ is unsaturated.
    val pc = greatest(least(p, lit(1.0 - 1e-15)), lit(1e-15))
    val metrics = feats.agg(
      count(lit(1)).as("n"),
      avg(when((p >= 0.5) === (col("__y") === 1.0), 1.0).otherwise(0.0))
        .as("__acc"),
      avg(-(col("__y") * log(pc) + (lit(1.0) - col("__y")) * log(lit(1.0) - pc)))
        .as("__loss"))
    import spark.implicits._
    val terms = ("bias" +: xCols).zip(w.toSeq).zipWithIndex
      .map { case ((t, wj), i) => (i.toLong, t, wj) }
      .toDF("term_idx", "term", "__w")
    terms.crossJoin(broadcast(metrics))
      .select(col("term_idx"), col("term"), round(col("__w"), 6).as("weight"),
        col("n"), round(col("__acc"), 6).as("accuracy"),
        round(col("__loss"), 6).as("log_loss"))
  }
}
