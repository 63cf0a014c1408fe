package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinsSpec extends SparkSpec {

  test("saltedJoin == plain join (salt moves rows, never changes the result)") {
    import spark.implicits._
    // one pathologically hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "lv")
    val right = (1L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = SkewJoins.saltedJoin(left, right, Seq("k"), salt = 8)
      .select("k", "lv", "rv")
    assert(rowsOf(salted) == rowsOf(plain))
    assert(plain.count() == 900 + 49)
  }

  test("the hot key actually spreads across salt values") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
      .withColumn("__salt", (rand(42L) * 8).cast("int"))
    val distinctSalts = left.select("__salt").distinct().count()
    assert(distinctSalts >= 6, s"1000 rows of one key should hit most of 8 salts, got $distinctSalts")
  }

  test("salt of 1 or less is rejected — a plain join is strictly better") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoins.saltedJoin(df, df, Seq("k"), salt = 1)
    }
  }
}
