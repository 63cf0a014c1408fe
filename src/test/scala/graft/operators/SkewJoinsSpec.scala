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

  test("hotKeySaltedJoin == plain join; detection finds exactly the hot key") {
    import spark.implicits._
    // key 1 is hot (900 rows), tail keys have 1 row each
    val left = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "lv")
    val right = (1L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    // fraction 1.0 → detection is exact; threshold 100 → only key 1 is hot
    val salted = SkewJoins.hotKeySaltedJoin(left, right, Seq("k"),
      salt = 8, hotThreshold = 100, sampleFraction = 1.0)
    assert(rowsOf(salted.select("k", "lv", "rv")) == rowsOf(plain))
    // the detection pre-pass itself: exactly key 1, nothing else —
    // a regression that salts nothing (or everything) fails HERE even
    // though the join result would still be correct
    val hot = SkewJoins.detectHotTags(left, Seq("k"),
      hotThreshold = 100, sampleFraction = 1.0, seed = 42L, maxHotKeys = 1000)
    assert(hot == Set("1"), s"only the 900-row key is hot: $hot")
    // salt-space spread of the left side is covered by the standalone
    // rand-spread test above; result-invariance plus exact detection
    // pins the operator's observable contract
  }

  test("hotKeySaltedJoin with nothing hot degenerates to the plain join result") {
    import spark.implicits._
    val left = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "lv")
    val right = (1L to 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val out = SkewJoins.hotKeySaltedJoin(left, right, Seq("k"),
      salt = 4, hotThreshold = 50, sampleFraction = 1.0)
    assert(out.count() == 100)
  }

  test("hotKeySaltedJoinAuto: partition-relative threshold salts the skewed key, not a uniform corpus") {
    import spark.implicits._
    // threshold formula first: skewFactor × |left| / shuffle partitions
    val uniform = (1L to 800L).map(k => (k, s"v$k")).toDF("k", "lv")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(SkewJoins.autoHotThreshold(uniform, skewFactor = 2.0) ==
      math.max(1L, math.round(2.0 * 800 / parts)))
    // uniform corpus: every key ~1 row, nobody dominates a partition →
    // nothing detected hot at the auto threshold
    val hotUniform = SkewJoins.detectHotTags(uniform, Seq("k"),
      SkewJoins.autoHotThreshold(uniform, 2.0), sampleFraction = 1.0,
      seed = 42L, maxHotKeys = 1000)
    assert(hotUniform.isEmpty, s"uniform corpus must salt nothing: $hotUniform")
    // skewed corpus: one key holds 90% of rows → it (and only it) is hot,
    // and the join still equals the plain join
    val skewed = ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "lv")
    val hotSkewed = SkewJoins.detectHotTags(skewed, Seq("k"),
      SkewJoins.autoHotThreshold(skewed, 2.0), sampleFraction = 1.0,
      seed = 42L, maxHotKeys = 1000)
    assert(hotSkewed == Set("1"), s"only the 900-row key dominates a partition: $hotSkewed")
    val right = (1L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = skewed.join(right, Seq("k")).select("k", "lv", "rv")
    val auto = SkewJoins.hotKeySaltedJoinAuto(skewed, right, Seq("k"),
      salt = 8, sampleFraction = 1.0)
    assert(rowsOf(auto.select("k", "lv", "rv")) == rowsOf(plain))
  }

  test("hotKeySaltedJoin caps the hot-key set instead of collecting unbounded") {
    import spark.implicits._
    val left = (1L to 200L).flatMap(k => Seq((k, "a"), (k, "b"))).toDF("k", "lv")
    val right = (1L to 10L).map(k => (k, s"r$k")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      // every key is "hot" at threshold 1 → more than maxHotKeys=50
      SkewJoins.hotKeySaltedJoin(left, right, Seq("k"),
        salt = 2, hotThreshold = 1, sampleFraction = 1.0, maxHotKeys = 50)
    }
  }

  test("keySkewProfile: counts, ppm shares, ceil salt factor, top-K order") {
    import spark.implicits._
    // N = 100 rows over D = 4 keys: 70 / 20 / 6 / 4
    val df = (Seq.fill(70)(1L) ++ Seq.fill(20)(2L) ++ Seq.fill(6)(3L) ++ Seq.fill(4)(4L))
      .toDF("k")
    val got = SkewJoins.keySkewProfile(df, "k", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // salt = ceil(cnt * D / N): 70*4/100 -> 2.8 -> 3; 20*4/100 -> 0.8 -> 1
    assert(got.toSeq == Seq(
      (1L, 70L, 700000L, 3L),
      (2L, 20L, 200000L, 1L),
      (3L, 6L, 60000L, 1L)))
  }

  test("keySkewProfile plans a take-ordered top-K, not a global sort") {
    import spark.implicits._
    val df = (1L to 100L).toDF("k")
    val plan = SkewJoins.keySkewProfile(df, "k", 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  // ---- adaptive planning: the tri-fixture audit ----------------------
  // one hot key (900 of 1000 rows) — at 4 shuffle partitions the default
  // 2x threshold is 500, so the skew is detectable with the defaults
  private def skewedLeft = {
    import spark.implicits._
    ((1 to 900).map(i => (1L, s"v$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"t$i")))
      .toDF("k", "lv")
  }
  private def uniformLeft = {
    import spark.implicits._
    (1 to 1000).map(i => ((i % 100).toLong + 1, s"v$i")).toDF("k", "lv")
  }
  private def smallRight = {
    import spark.implicits._
    (1L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
  }

  test("decide: skewed fixture → salted, with the fan-out sized from the measurement") {
    val d = SkewJoins.decide(skewedLeft, smallRight, Seq("k"),
      broadcastBytes = 0L, sampleFraction = 1.0)
    d.strategy match {
      case SkewJoins.SaltHotKeys(salt, threshold) =>
        // threshold = 2.0 * 1000/4 = 500; estHot = 900 → salt = ceil(900/500) = 2
        assert(threshold == 500L && d.estHotKeyRows == 900L && salt == 2,
          s"expected salt 2 at threshold 500 from estHot 900, got $d")
      case other => fail(s"skewed fixture must salt, decided $other")
    }
    assert(d.leftRows == 1000L)
  }

  test("decide: uniform fixture → plain shuffle (no replication, AQE owns the rest)") {
    val d = SkewJoins.decide(uniformLeft, smallRight, Seq("k"),
      broadcastBytes = 0L, sampleFraction = 1.0)
    assert(d.strategy == SkewJoins.PlainShuffle, s"uniform keys must not salt: $d")
    assert(d.estHotKeyRows == 10L && d.hotThreshold == 500L)
  }

  test("decide: small right under the byte budget → broadcast, measured in bytes") {
    val d = SkewJoins.decide(skewedLeft, smallRight, Seq("k"))
    assert(d.strategy == SkewJoins.BroadcastRight, s"50-row dim must broadcast: $d")
    assert(d.rightBytes > 0 && d.rightBytes <= 64L * 1024 * 1024)
  }

  test("adaptiveJoin: every strategy returns the identical row set; the salted plan salts, the plain plan doesn't") {
    val plain = skewedLeft.join(smallRight, Seq("k")).select("k", "lv", "rv")
    val saltedDecision = SkewJoins.decide(skewedLeft, smallRight, Seq("k"),
      broadcastBytes = 0L, sampleFraction = 1.0)
    val salted = SkewJoins.apply(skewedLeft, smallRight, Seq("k"),
      saltedDecision, sampleFraction = 1.0)
    assert(rowsOf(salted.select("k", "lv", "rv")) == rowsOf(plain))
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"),
      "the salted decision must actually salt the executed plan")

    val uniformPlain = SkewJoins.adaptiveJoin(uniformLeft, smallRight, Seq("k"),
      broadcastBytes = 0L, sampleFraction = 1.0)
    assert(!uniformPlain.queryExecution.executedPlan.toString.contains("__salt"),
      "a uniform fixture must not pay salt replication")
    assert(rowsOf(uniformPlain.select("k", "lv", "rv")) ==
      rowsOf(uniformLeft.join(smallRight, Seq("k")).select("k", "lv", "rv")))

    val bcast = SkewJoins.adaptiveJoin(skewedLeft, smallRight, Seq("k"))
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the broadcast decision must plan a broadcast hash join")
    assert(rowsOf(bcast.select("k", "lv", "rv")) == rowsOf(plain))
  }

  test("decide costs exactly one action past the broadcast shortcut — no separate count()") {
    // the row count must come from the SAME sampled aggregate that
    // measures the hottest key (or from plan stats at zero scans) — a
    // separate left.count() is a second corpus pass per decision.
    // Count executed ACTIONS (not scheduler jobs — AQE splits one query
    // into several) via a QueryExecutionListener.
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = actions.add(funcName)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = actions.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val d = SkewJoins.decide(skewedLeft, smallRight, Seq("k"),
        broadcastBytes = 0L, sampleFraction = 1.0)
      assert(d.leftRows == 1000L, s"sum-estimated rows at fraction 1.0 must be exact: $d")
      // the execution listener fires async — wait for the one expected
      // action, then grace for any unexpected second one
      val deadline = System.currentTimeMillis() + 10000
      while (actions.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(25)
      Thread.sleep(300)
      val seen = actions.toArray(Array.empty[String]).toSeq
      assert(seen == Seq("collect"),
        s"decide must spend exactly one sampled-aggregate collect, ran: $seen")
    } finally spark.listenerManager.unregister(listener)
  }

  test("estimateJoinOutputRows: CMS inner product never underestimates, close on a small fixture") {
    val exact = skewedLeft.join(smallRight, Seq("k")).count()
    val est = SkewJoins.estimateJoinOutputRows(skewedLeft, smallRight, Seq("k"))
    assert(est >= exact, s"CMS must overestimate, got $est < $exact")
    assert(est <= exact * 2, s"estimate wildly off on a tiny fixture: $est vs $exact")
  }
}
