package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via deletion-neighborhood blocking (the
  * SymSpell idea): if `lev(a, b) <= d`, then deleting at most `d`
  * characters from each reaches a common variant — so hashing every
  * ≤d-deletion variant and joining on the hash yields a candidate set
  * with EXACT recall, verified by a real Levenshtein pass. Typo-level
  * entity resolution (near-identical titles, OCR noise, tracking-code
  * variants) without the all-pairs cross join.
  *
  * Scale shape: the neighborhood (O(len^d) variants per row) is
  * generated map-side as 64-bit hashes — the exploded table shuffles
  * once for the self-join (the strings ride along so the exact verify
  * is a map-side projection after the candidate dedup, not another
  * corpus join). Hash collisions only add candidates (the verify is
  * exact), never lose pairs. Short strings make hot variants (many
  * strings share a short deletion); the candidate dedup caps the
  * damage and AQE splits what remains — same skew posture as the LSH
  * band join.
  */
object FuzzyJoin {

  /** All unordered pairs (id_a < id_b) with `lev(str_a, str_b) <=
    * maxDist`, plus the exact distance. `maxDist` 1 or 2 (the
    * neighborhood grows O(len^d) — beyond 2 use the n-gram Jaccard
    * miners instead).
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2, got $maxDist")
    // installs LevenshteinThresholdRule: the `dist <= maxDist` verify
    // below optimizes to the banded O(len·k) DP with early exit
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val rows = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)

    def deletions(s: Column): Column =
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i)))

    val d1 = deletions(col("__s"))
    val neighborhood =
      if (maxDist == 1) array_union(array(col("__s")), d1)
      else array_union(array_union(array(col("__s")), d1),
        array_distinct(flatten(transform(d1, t => transform(sequence(lit(1), length(t)),
          i => concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t) - i)))))))

    val blocks = rows.select(col("__id"), col("__s"),
        explode(array_distinct(transform(neighborhood, v => xxhash64(v)))).as("__block"))
    val candidates = blocks.as("a").join(blocks.as("b"),
        col("a.__block") === col("b.__block") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__s").as("__sa"), col("b.__s").as("__sb"))
      .distinct()
    candidates
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
