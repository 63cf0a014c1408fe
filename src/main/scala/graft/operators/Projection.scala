package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns:
  * `out_j = Σ_i v_i · sign(i,j) / sqrt(dOut)` with a ±1 sign matrix
  * (Achlioptas '01 — database-friendly projections; ±1 preserves
  * pairwise distances within (1±ε) like Gaussian entries do). The
  * dimensionality-reduction step before ANN indexing / clustering when
  * the source embeddings are wider than the index wants.
  *
  * The sign matrix is DETERMINISTIC — parity of the first hex digit of
  * `md5("i_j")` — so any engine (and the DuckDB oracle) rebuilds the
  * identical matrix: reproducibility-as-data, the same policy as the
  * hash-split sampler. It is built once on the driver (dIn·dOut bytes,
  * a few KB) and ships inside the plan as a literal; per row the
  * projection is a pure map-side fold over the vector — ZERO shuffle,
  * nothing corpus-sized moves. (The naive formulation — explode
  * elements, join a sign table, re-aggregate — shuffles dIn·dOut× the
  * corpus; that formulation exists only as the oracle's SQL.)
  *
  * The per-element lambda is interpreted (HOF); at kernel-bound scale
  * the next rung is a codegen'd Expression like `QuantizeInt8Stats` —
  * same contract, measured need first.
  */
object Projection {

  /** The deterministic ±1/√dOut projection matrix, indexed
    * [outputDim][inputDim] — shared contract with the q89 oracle SQL.
    */
  def signMatrix(dIn: Int, dOut: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    Array.tabulate(dOut, dIn) { (j, i) =>
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0
      if (((hex(0) >> 4) & 0xf) % 2 == 0) scale else -scale
    }
  }

  /** Appends `<out>` = the dOut-dim projection of `vecCol` (elements
    * cast to double). Rows whose vector is null project to null;
    * dimension mismatches fail loudly at runtime (element_at on a
    * short vector yields null → null output beats silent truncation).
    */
  def randomProject(df: DataFrame, vecCol: String, dIn: Int, dOut: Int,
                    out: String): DataFrame = {
    require(dIn >= 1 && dOut >= 1 && dOut <= dIn,
      s"need 1 <= dOut <= dIn, got dIn=$dIn dOut=$dOut")
    val signs: Column = typedlit(signMatrix(dIn, dOut))
    val projected = transform(sequence(lit(1), lit(dOut)), j =>
      aggregate(
        zip_with(col(vecCol), element_at(signs, j),
          (v, s) => v.cast("double") * s),
        lit(0.0), (acc, x) => acc + x))
    // a null vector must project to a null ARRAY, not an array of nulls
    df.withColumn(out, when(col(vecCol).isNotNull, projected))
  }

  /** Top principal component of a vector corpus by power iteration —
    * the primitive behind embedding whitening / "all-but-the-top"
    * postprocessing (Mu & Viswanath ICLR '18: embedding sets share a
    * large common direction that hurts similarity search; you find it
    * with exactly this operator) and the 1-component PCA screen.
    *
    * Scale split (the k-means-centroid convention): the corpus-sized
    * work is ONE pass accumulating n, Σv and Σvvᵀ per partition
    * (d + d² doubles each) reduced to the driver; the centered scatter
    * G = Σvvᵀ − n·μμᵀ and the power iteration (x ← Gx∕‖Gx‖ from the
    * uniform start 1∕√d, a FIXED iteration count — exactly restatable
    * by an external engine, no convergence test) are d²-bounded driver
    * arithmetic. Nothing corpus-sized shuffles or collects.
    *
    * Sign convention (eigenvectors are sign-ambiguous): the component
    * with the largest |loading| is made positive, ties to the lowest
    * index — applied ONCE after the final iteration (per-step
    * normalization is positive-scale so it never flips signs).
    *
    * Output: one row per dimension (component 1..d, loading,
    * eigenvalue, var_share = λ∕trace(G)), all rounded to 6 dp (the
    * repo's cross-engine float-parity convention).
    */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
                      iterations: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (xs, lam, share) = pcaDeflated(df, vecCol, dim, 1, iterations).head
    xs.toSeq.zipWithIndex.map { case (l, i) =>
      (i + 1L, r6(l), r6(lam), r6(share))
    }.toDF("component", "loading", "eigenvalue", "var_share")
  }

  /** Top-k principal components via power iteration + Hotelling
    * deflation (G ← G − λ·uuᵀ after each extracted component) — the
    * actual all-but-the-top recipe removes the top ~d∕100 components,
    * not one. Same scale split as [[pcaTopComponent]]: one corpus pass
    * for the scatter, k·d²-bounded driver arithmetic after; var_share
    * is against the ORIGINAL trace so the shares of successive
    * components are comparable. Output: (pc 1..k, component 1..d,
    * loading, eigenvalue, var_share), 6-dp rounded.
    */
  def pcaComponents(df: DataFrame, vecCol: String, dim: Int, k: Int,
                    iterations: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    pcaDeflated(df, vecCol, dim, k, iterations).zipWithIndex.flatMap {
      case ((xs, lam, share), pcIdx) =>
        xs.toSeq.zipWithIndex.map { case (l, i) =>
          (pcIdx + 1L, i + 1L, r6(l), r6(lam), r6(share))
        }
    }.toDF("pc", "component", "loading", "eigenvalue", "var_share")
  }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Shared core: one scatter pass, then k rounds of (power iteration,
    * sign fix, Rayleigh λ, deflation). Returns per component the
    * UNROUNDED (loadings, λ, λ∕trace₀).
    */
  private def pcaDeflated(df: DataFrame, vecCol: String, dim: Int, k: Int,
                          iterations: Int): Seq[(Array[Double], Double, Double)] = {
    require(dim >= 1, s"dim must be positive, got $dim")
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    require(iterations >= 1, s"need >= 1 iterations, got $iterations")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .as[Seq[Double]]
    val (n, sums, scatter) = vecs.rdd.mapPartitions { it =>
      val s = new Array[Double](dim)
      val m = new Array[Double](dim * dim)
      var c = 0L
      it.foreach { v =>
        c += 1
        var i = 0
        while (i < dim) {
          val vi = v(i)
          s(i) += vi
          var j = 0
          while (j < dim) { m(i * dim + j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      Iterator((c, s, m))
    }.collect() // one (d + d²)-double tuple per partition — bounded
      .foldLeft((0L, new Array[Double](dim), new Array[Double](dim * dim))) {
        case ((c1, s1, m1), (c2, s2, m2)) =>
          var i = 0
          while (i < dim) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < dim * dim) { m1(i) += m2(i); i += 1 }
          (c1 + c2, s1, m1)
      }
    require(n > 0, "pca needs at least one full-dimension vector")
    val g = Array.tabulate(dim, dim)((i, j) =>
      scatter(i * dim + j) - sums(i) * sums(j) / n)
    val trace0 = (0 until dim).map(i => g(i)(i)).sum
    (1 to k).map { _ =>
      var x = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      for (_ <- 1 to iterations) {
        val y = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * x(j)).sum)
        val nrm = math.sqrt(y.map(v => v * v).sum)
        if (nrm > 0) x = y.map(_ / nrm) // zero scatter → x stays the start
      }
      val kMax = x.indices.maxBy(i => (math.abs(x(i)), -i))
      val xs = if (x(kMax) < 0) x.map(-_) else x
      val lam = (0 until dim).map(i =>
        xs(i) * (0 until dim).map(j => g(i)(j) * xs(j)).sum).sum
      // Hotelling deflation with the UNROUNDED component
      for (i <- 0 until dim; j <- 0 until dim)
        g(i)(j) -= lam * xs(i) * xs(j)
      (xs, lam, if (trace0 == 0) 0.0 else lam / trace0)
    }
  }
}
