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

  test("LevenshteinThresholdRule rewrites the verify filter to the banded DP") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq((1L, "kitten"), (2L, "sitten"), (3L, "zzzzzz")).toDF("id", "s")
    val filtered = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.s"), col("b.s")) <= 1)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the unbounded two-arg levenshtein must be gone from the condition,
    // replaced by the thresholded form compared against 0
    assert(optimized.contains("levenshtein(s#") || optimized.contains("levenshtein("),
      optimized)
    assert("levenshtein\\(.*Some\\(1\\)\\) >= 0".r.findFirstIn(optimized).isDefined,
      s"expected banded rewrite in:\n$optimized")
    // semantics unchanged, including the long-cast comparison form
    assert(filtered.count() == 1)
    val viaColumn = df.withColumn("d", levenshtein(lit("kitten"), col("s")))
      .filter(col("d") <= 1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(viaColumn == Set(1L, 2L))
  }

  test("the rule leaves unbounded and negative-bound comparisons alone") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq((1L, "abc")).toDF("id", "s")
    // projection with no bound: stays the 2-arg form
    val proj = df.select(levenshtein(col("s"), lit("abd")).as("d"))
    assert(!proj.queryExecution.optimizedPlan.toString.matches("(?s).*levenshtein\\([^)]*,\\s*-?\\d+\\)\\s*>=.*"))
    assert(proj.collect()(0).getInt(0) == 1)
    // negative bound: constant-folds to empty, never a -1-threshold call
    assert(df.filter(levenshtein(col("s"), lit("x")) <= -1).count() == 0)
  }

  test("rejects unsupported distances") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(Seq((1L, "x")).toDF("id", "s"), "id", "s", 3)
    }
  }
}
