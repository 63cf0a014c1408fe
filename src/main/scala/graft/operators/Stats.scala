package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical inference over corpus-scale data — resampling confidence
  * intervals and inter-annotator agreement. No reference implementation
  * exists (SURVEY.md §7.4 extension family; methods from the published
  * literature — Chamandy et al. "Estimating Uncertainty for Massive
  * Data Streams" (Google TR '12) Poisson bootstrap, Cohen '60 kappa).
  */
object Stats {

  /** Cumulative Poisson(1) CDF ladder, P(X ≤ k) for k = 0..6 — enough
    * mass (1 − 8.1e-5 at k=6) that the tail clamp at 7 is negligible.
    * Fixed literals so an external SQL engine restates them exactly.
    */
  private val poissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** Deterministic Poisson(1) weight for (unit, replicate): uniform
    * u ∈ [0,1) from the first 8 md5 hex chars of "unit|b", inverted
    * through the CDF ladder. Pure column arithmetic — portable to any
    * engine with md5.
    */
  def poissonWeight(unit: Column, b: Column): Column = {
    val u = conv(substring(md5(concat_ws("|", unit, b)), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // ascending first-match CASE ladder: when(u<cdf0, 0).otherwise(
    // when(u<cdf1, 1). …, built from the tail up
    poissonCdf1.zipWithIndex.reverse
      .foldLeft(lit(7L)) { case (tail, (p, k)) =>
        when(u < p, lit(k.toLong)).otherwise(tail)
      }
  }

  /** Poisson bootstrap of a mean (Chamandy '12): each of `nReplicates`
    * resamples weights every row by an independent Poisson(1) draw —
    * the distributed bootstrap, since true multinomial resampling needs
    * global coordination but Poisson weights are per-row independent.
    * Draws are deterministic in (idCol, replicate), so reruns and
    * engine replays agree exactly.
    *
    * Scale: one corpus pass explodes B replicate ids per row and
    * partially aggregates map-side into a B-row table — B× CPU, but
    * the shuffle is B cells, never the corpus. Output: one row per
    * replicate (b, n_eff, mean_b).
    */
  def poissonBootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
                            nReplicates: Int): DataFrame = {
    require(nReplicates >= 1, s"need >= 1 replicates, got $nReplicates")
    // one md5 per (row, BLOCK of 4 replicates): the digest's 128 bits
    // are four independent 32-bit words, so hashing per replicate would
    // do 4× the work for the same entropy. Two-level explode keeps the
    // digest computed once per block row.
    val nBlocks = (nReplicates + 3) / 4
    val pos = col("__j") * 8 + 1
    val u = (conv(col("__md5").substr(pos, lit(8)), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val w = poissonCdf1.zipWithIndex.reverse
      .foldLeft(lit(7L)) { case (tail, (p, k)) =>
        when(u < p, lit(k.toLong)).otherwise(tail)
      }
    df.select(col(idCol).as("__id"), col(valueCol).cast("double").as("__v"))
      // pinned fan-out: a single-file input arrives as ONE split, and
      // this pipeline is pure map-side work into a B-row aggregate —
      // without the explicit repartition the B× hashing runs on one
      // task (row-count-proportional work, not input-bytes; same
      // reasoning as the containment block join)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("__blk", explode(sequence(lit(0), lit(nBlocks - 1))))
      .withColumn("__md5", md5(concat_ws("|", col("__id"), col("__blk"))))
      .withColumn("__j", explode(sequence(lit(0), lit(3))))
      .withColumn("b", col("__blk") * 4 + col("__j") + 1)
      .filter(col("b") <= nReplicates)
      .withColumn("__w", w)
      .groupBy(col("b").cast("long").as("b"))
      .agg(sum(col("__w")).as("n_eff"),
        (sum(col("__w") * col("__v")) / sum(col("__w"))).as("mean_b"))
  }

  /** Percentile confidence interval from the replicate means, plus the
    * plain point estimate: one row (n, point_mean, n_replicates,
    * ci_lo, ci_hi) at the given two-sided level (exact interpolated
    * percentiles over the B-row table).
    */
  def poissonBootstrapCI(df: DataFrame, idCol: String, valueCol: String,
                         nReplicates: Int, alpha: Double = 0.05): DataFrame = {
    val means = poissonBootstrapMeans(df, idCol, valueCol, nReplicates)
    val point = df.agg(count(col(valueCol)).as("n"),
      avg(col(valueCol).cast("double")).as("point_mean"))
    means.agg(
        count(lit(1)).as("n_replicates"),
        percentile(col("mean_b"), lit(alpha / 2)).as("ci_lo"),
        percentile(col("mean_b"), lit(1 - alpha / 2)).as("ci_hi"))
      .crossJoin(broadcast(point))
      .select(col("n"), col("point_mean"), col("n_replicates"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Paired bootstrap significance for a metric delta (Koehn EMNLP '04
    * §3 — "is system A really better than system B on this test set"),
    * with the resampling done as the Poisson bootstrap so it
    * distributes: both systems score the SAME units, each replicate
    * reweights every unit by a deterministic Poisson(1) draw (the
    * [[poissonBootstrapMeans]] machinery on the per-unit delta — one
    * draw per (unit, replicate), shared by A and B by construction,
    * which is exactly what "paired" means), and the test statistic is
    * the replicate mean delta. Reported per Koehn: the point means and
    * delta, a percentile CI on the delta, and `frac_a_better` — the
    * fraction of replicates whose mean delta is > 0 (≥ 1 − α ⇒ A's
    * win is significant at level α; the p-value for "A ≤ B" is
    * 1 − frac_a_better).
    *
    * Pass integer-valued scores (e.g. metric micros, the [[TextEval]]
    * convention) and every replicate sum is exact — order-independent
    * and engine-replayable. Scale: one corpus pass for the draws, a
    * B-row shuffle, and two broadcast scalars; the corpus never
    * collects. Output: one row (n, mean_a, mean_b, delta,
    * n_replicates, ci_lo, ci_hi, frac_a_better).
    */
  def pairedBootstrapDelta(df: DataFrame, idCol: String, aCol: String,
                           bCol: String, nReplicates: Int,
                           alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val deltas = df.select(col(idCol).as("__pid"),
      (col(aCol).cast("double") - col(bCol).cast("double")).as("__d"),
      col(aCol).cast("double").as("__a"), col(bCol).cast("double").as("__b"))
    val means = poissonBootstrapMeans(deltas, "__pid", "__d", nReplicates)
    val point = deltas.agg(count(lit(1)).as("n"),
      avg(col("__a")).as("mean_a"), avg(col("__b")).as("mean_b"),
      avg(col("__d")).as("delta"))
    means.agg(
        count(lit(1)).as("n_replicates"),
        percentile(col("mean_b"), lit(alpha / 2)).as("ci_lo"),
        percentile(col("mean_b"), lit(1 - alpha / 2)).as("ci_hi"),
        avg(when(col("mean_b") > 0, lit(1.0)).otherwise(lit(0.0)))
          .as("frac_a_better"))
      .crossJoin(broadcast(point))
      .select(col("n"), col("mean_a"), col("mean_b"), col("delta"),
        col("n_replicates"), col("ci_lo"), col("ci_hi"),
        col("frac_a_better"))
  }

  /** Cohen's kappa between two categorical label columns (two
    * annotators over the same rows): κ = (p_o − p_e)/(1 − p_e) with
    * p_o the observed agreement and p_e the chance agreement from the
    * marginals (Cohen '60) — the label-quality gate a crowdsourced
    * annotation pipeline releases on.
    *
    * Scale: the agreement count and both marginals reduce from one
    * cell-sized contingency aggregate (the [[Scoring.mutualInformation]]
    * pattern); everything downstream is cell-count arithmetic.
    * Output: one row (n, po, pe, kappa).
    */
  def cohensKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__nab"))
    val ma = cells.groupBy(col("__a")).agg(sum(col("__nab")).as("__na"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__nab")).as("__nb"))
    val agree = cells.agg(
      sum(col("__nab")).as("__n"),
      sum(when(col("__a") <=> col("__b"), col("__nab")).otherwise(0L))
        .as("__agree"))
    val pe = ma.join(mb, col("__a") <=> col("__b"))
      .agg(sum(col("__na") * col("__nb")).as("__ee"))
    broadcast(agree).crossJoin(broadcast(pe))
      .withColumn("po", col("__agree") / col("__n"))
      .withColumn("pe", col("__ee") / (col("__n") * col("__n")))
      .withColumn("kappa", (col("po") - col("pe")) / (lit(1) - col("pe")))
      .select(col("__n").as("n"), col("po"), col("pe"), col("kappa"))
  }

  /** Reliability diagram + expected calibration error (Naeini et al.
    * AAAI '15; Guo et al. ICML '17): `confCol` ∈ [0,1] cut into
    * `nBins` equal-width bins (the top edge folds into the last bin),
    * per-bin mean confidence vs empirical accuracy of the boolean
    * `correctCol`, and ECE = Σ (nᵇ/N)·|accᵇ − confᵇ| repeated on every
    * row — the one number a filter-model gate thresholds on.
    *
    * One hash aggregate over the corpus (nBins-row result); the ECE
    * total joins back as a broadcast 1-row scalar (the [[cohensKappa]]
    * pattern) — nothing corpus-sized past the first aggregate.
    * Output: (bin, n, avg_conf, accuracy, gap, ece), one row per
    * non-empty bin.
    */
  def calibration(df: DataFrame, confCol: String, correctCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val byBin = df.select(
        least(floor(col(confCol).cast("double") * nBins), lit(nBins - 1))
          .cast("long").as("bin"),
        col(confCol).cast("double").as("__conf"),
        col(correctCol).cast("boolean").cast("double").as("__ok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), avg(col("__conf")).as("avg_conf"),
        avg(col("__ok")).as("accuracy"))
      .withColumn("gap", abs(col("accuracy") - col("avg_conf")))
      .persist()
    graft.Caches.track(byBin)
    val tot = byBin.agg(
      (sum(col("gap") * col("n")) / sum(col("n"))).as("ece"))
    byBin.crossJoin(broadcast(tot))
  }
}
