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
}
