package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature engineering for ML training pipelines — leakage-safe
  * categorical target encoding and fitted quantile discretization. No
  * reference implementation exists (SURVEY.md §7.4 extension family:
  * spec'd from the Spark API and published practice — Micci-Barreca
  * KDD '01 target statistics, the leave-one-out variant that keeps the
  * encoding unbiased without a fold split).
  *
  * Scale design (100 TB): both operators are fit-then-transform. The fit
  * is one aggregation whose result is CATEGORY-sized (target encoding)
  * or K-sized (bin breakpoints) — kilobytes that broadcast; the
  * transform is map-side arithmetic on the corpus with no shuffle. The
  * leave-one-out correction subtracts the row's own target from the
  * broadcast category sum, so no per-row window is ever needed.
  */
object Features {

  /** Leave-one-out target encoding of a categorical column: each row
    * gets the mean of `targetCol` over the OTHER rows of its category,
    * enc_i = (sum_cat − y_i) / (n_cat − 1) — the target statistic with
    * the row's own label removed, so the feature never leaks its own
    * outcome (Micci-Barreca '01 §3 without the noise term, made exact).
    * Singleton categories (n_cat = 1) have no other rows; they fall
    * back to the global leave-one-out mean (sum_all − y_i)/(n_all − 1).
    *
    * One category-sized aggregate broadcast back; the encode itself is
    * per-row arithmetic — no window, no second shuffle.
    * Output: input row id + category + `loo_enc`.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: String): DataFrame = {
    val y = col(targetCol).cast("double")
    val catStats = df.groupBy(col(catCol))
      .agg(sum(y).as("__cat_sum"), count(y).as("__cat_n"))
    val g = df.agg(sum(y).as("__g_sum"), count(y).as("__g_n"))
    df.select(col(idCol), col(catCol), y.as("__y"))
      .join(broadcast(catStats), Seq(catCol))
      .crossJoin(broadcast(g))
      .withColumn("loo_enc",
        when(col("__cat_n") > 1,
          (col("__cat_sum") - col("__y")) / (col("__cat_n") - 1))
          .otherwise((col("__g_sum") - col("__y")) / (col("__g_n") - 1)))
      .select(col(idCol), col(catCol), col("loo_enc"))
  }

  /** Fit equi-depth bin breakpoints: the k−1 interior quantiles of
    * `valueCol` (linear interpolation, Spark's exact `percentile` —
    * DuckDB `quantile_cont` parity is the q09 median precedent).
    * Returns (bin, lo) rows: bin b ∈ [1, k] covers values in
    * (breakpoint(b−1), breakpoint(b)] with ±∞ at the ends. K-sized —
    * broadcast it.
    */
  def fitQuantileBins(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 bins, got $k")
    val ps = (1 until k).map(_.toDouble / k)
    df.agg(percentile(col(valueCol).cast("double"),
        typedlit(ps.toArray)).as("__bps"))
      .select(posexplode(col("__bps")).as(Seq("__i", "breakpoint")))
      .select((col("__i") + 1).cast("int").as("bin"), col("breakpoint"))
  }

  /** Apply fitted breakpoints: bin = 1 + count of breakpoints strictly
    * below the value (values equal to a breakpoint go LEFT — the
    * half-open (lo, hi] convention `fitQuantileBins` documents).
    * Broadcast K−1 breakpoints as an array; the transform is one
    * map-side `aggregate` over it — the corpus never shuffles.
    */
  def applyQuantileBins(df: DataFrame, valueCol: String,
                        breakpoints: DataFrame): DataFrame = {
    val bps = broadcast(breakpoints.orderBy(col("bin"))
      .agg(collect_list(col("breakpoint")).as("__bps")))
    df.crossJoin(bps)
      .withColumn("bin",
        (lit(1) + aggregate(col("__bps"), lit(0),
          (acc, bp) => acc + when(col(valueCol).cast("double") > bp, 1)
            .otherwise(0))).cast("int"))
      .drop("__bps")
  }

  /** Fit + apply in one call (the common path). */
  def quantileBins(df: DataFrame, valueCol: String, k: Int): DataFrame =
    applyQuantileBins(df, valueCol, fitQuantileBins(df, valueCol, k))
}
