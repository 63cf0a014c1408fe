package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  private def pairs(rows: Seq[(Long, String)], d: Int) = {
    import spark.implicits._
    FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("finds substitutions, insertions, deletions at d=1; excludes d=2") {
    val rows = Seq(
      1L -> "spark", 2L -> "sparc",  // substitution (d=1)
      3L -> "spar",                  // deletion of k (d=1 to spark)
      4L -> "sparks",                // insertion (d=1 to spark)
      5L -> "scala")                 // far from everything
    val got = pairs(rows, 1)
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (2L, 3L, 1L)),
      got.toString)
  }

  test("matches the brute-force pair set exactly at d=1 and d=2") {
    import spark.implicits._
    // adversarial small alphabet: many near-collisions
    val strs = Seq("ab", "abc", "abd", "acd", "bcd", "abcd", "abce",
      "xy", "xyz", "ayz", "ab c", "a")
    val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val brute = df.as("a").crossJoin(df.as("b"))
        .filter(col("a.id") < col("b.id") &&
          levenshtein(col("a.s"), col("b.s")) <= d)
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(pairs(rows, d) == brute, s"d=$d")
    }
  }

  test("empty strings and duplicates: lev 0 pairs included, nulls skipped") {
    val got = pairs(Seq(1L -> "same", 2L -> "same", 3L -> null, 4L -> ""), 1)
    assert(got == Set((1L, 2L, 0L)))
  }

  test("rejects unsupported distances") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(Seq((1L, "x")).toDF("id", "s"), "id", "s", 3)
    }
  }
}
