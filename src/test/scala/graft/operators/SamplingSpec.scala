package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("split is a pure function of the key: exhaustive, disjoint, repeatable") {
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.split(docs, "doc_id", weights)
    val b = Sampling.split(docs.orderBy(rand(7)).repartition(7), "doc_id", weights)
    // every row labeled
    assert(a.filter(col("split").isNull).count() == 0)
    // row order and partitioning must not change any assignment
    val byId = a.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    b.select("doc_id", "split").collect().foreach { r =>
      assert(byId(r.getLong(0)) == r.getString(1), s"doc ${r.getLong(0)} moved splits")
    }
    // proportions near the weights (resolution 1/10000, binomial noise)
    val n = docs.count().toDouble
    val frac = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.04, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.04, frac.toString)
  }

  test("hashSample: deterministic subset, nested fractions compose") {
    val s10 = Sampling.hashSample(docs, "doc_id", 0.1).select("doc_id")
    val s30 = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
    val ids10 = s10.collect().map(_.getLong(0)).toSet
    val ids30 = s30.collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids30), "smaller fraction must nest inside larger")
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
  }

  test("stratifiedSample keeps roughly p of every stratum") {
    val p = 0.3
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang", p)
      .groupBy("lang").count()
      .join(docs.groupBy("lang").count().withColumnRenamed("count", "total"), "lang")
      .collect()
    got.foreach { r =>
      val frac = r.getLong(1).toDouble / r.getLong(2)
      assert(math.abs(frac - p) < 0.15, s"lang ${r.getString(0)}: $frac")
    }
  }

  test("null keys get a deterministic label and survive sampling") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), Some("")).toDF("k")
    val labeled = Sampling.split(df, "k", Seq("train" -> 0.5, "test" -> 0.5))
    // no null label, no silent drop
    assert(labeled.filter(col("split").isNull).count() == 0)
    assert(Sampling.hashSample(df, "k", 1.0).count() == 4)
    // null and empty-string keys hash differently (distinct marker)
    val bNull = Sampling.hashBucket(lit(null).cast("string"))
    val bEmpty = Sampling.hashBucket(lit(""))
    val r = spark.range(1).select(bNull.as("n"), bEmpty.as("e")).collect()(0)
    assert(!r.isNullAt(0) && r.getLong(0) != r.getLong(1))
    // stratified: null stratum is its own stratum, rows not lost at p=1
    val strat = Seq((Some("x"), 1L), (None, 2L), (None, 3L)).toDF("s", "k")
    assert(Sampling.stratifiedSample(strat, "k", "s", 1.0).count() == 3)
  }

  test("splitLabel is map-side: no Exchange before the aggregate") {
    val labeled = Sampling.split(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
    labeled.collect()
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"labeling must not shuffle:\n$plan")
  }

  test("weightedSample: weight 1 keeps all, 0 keeps none, rate tracks the weight") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (i, "x")).toDF("k", "v")
    assert(Sampling.weightedSample(df, "k", lit(1.0)).count() == 4000)
    assert(Sampling.weightedSample(df, "k", lit(0.0)).count() == 0)
    val kept = Sampling.weightedSample(df, "k", lit(0.3)).count()
    assert(math.abs(kept / 4000.0 - 0.3) < 0.05, s"rate ${kept / 4000.0}")
    // out-of-range weights clamp instead of misbehaving
    assert(Sampling.weightedSample(df, "k", lit(7.0)).count() == 4000)
    assert(Sampling.weightedSample(df, "k", lit(-2.0)).count() == 0)
    // deterministic under re-partitioning
    val a = Sampling.weightedSample(df, "k", lit(0.5)).select("k")
    val b = Sampling.weightedSample(df.repartition(13), "k", lit(0.5)).select("k")
    assert(rowsOf(a) == rowsOf(b))
  }

  test("capPerGroup keeps at most n per group, deterministically, order-independently") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("grp", "k")
    val capped = Sampling.capPerGroup(df, "grp", "k", 10)
    val sizes = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 10))
    // a group under the cap is untouched
    val small = Sampling.capPerGroup(df.filter(col("k") <= 5), "grp", "k", 10)
    assert(small.count() == 5)
    // determinism: same selection regardless of input partitioning/order
    val again = Sampling.capPerGroup(
      df.repartition(7).sortWithinPartitions(desc("k")), "grp", "k", 10)
    assert(rowsOf(capped) == rowsOf(again))
  }

  test("stratifiedSplit: exact per-stratum proportions; deterministic; weights validated") {
    import spark.implicits._
    // 10-row and 40-row strata: the hash split would only be exact in
    // expectation — the stratified split must be exact in fact
    val df = ((1L to 10L).map(i => ("small", i)) ++ (11L to 50L).map(i => ("big", i)))
      .toDF("stratum", "id")
    val split = Sampling.stratifiedSplit(df, "id", "stratum",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val sizes = split.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sizes(("small", "train")) == 8L && sizes(("small", "val")) == 1L &&
      sizes(("small", "test")) == 1L, sizes.toString)
    assert(sizes(("big", "train")) == 32L && sizes(("big", "val")) == 4L &&
      sizes(("big", "test")) == 4L, sizes.toString)
    // every row keeps exactly one label; membership is partition-invariant
    val again = Sampling.stratifiedSplit(
      df.repartition(7).sortWithinPartitions(desc("id")), "id", "stratum",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(rowsOf(split) == rowsOf(again))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSplit(df, "id", "stratum", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("temperatureRebalance: alpha<1 upsamples the rare group; alpha=1 is proportional") {
    import spark.implicits._
    // 900 vs 100 rows: natural share 9:1
    val df = ((1L to 900L).map(i => (i, "big")) ++ (1001L to 1100L).map(i => (i, "small")))
      .toDF("id", "g")
    def keepP(alpha: Double) = Sampling
      .temperatureRebalance(df, "id", "g", alpha, targetRows = 200L)
      .select("g", "keep_p").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prop = keepP(1.0)
    // alpha=1: equal keep probability across groups (expected 200 of 1000)
    assert(math.abs(prop("big") - 0.2) < 1e-12 && math.abs(prop("small") - 0.2) < 1e-12)
    val temp = keepP(0.5)
    // alpha=0.5: the small group's keep probability rises, the big one's falls
    assert(temp("small") > 0.2 && temp("big") < 0.2,
      s"temperature should favor the rare group: $temp")
    // expected total is preserved: sum over groups of n_g * keep_p = target
    val expected = 900 * temp("big") + 100 * temp("small")
    assert(math.abs(expected - 200.0) < 1e-9, s"expected-total drifted: $expected")
  }

  test("temperatureRebalance: a null group gets its allocation like any other") {
    import spark.implicits._
    val df = ((1L to 500L).map(i => (i, Option("en"))) ++
      (1001L to 1500L).map(i => (i, Option.empty[String]))).toDF("id", "g")
    val kept = Sampling.temperatureRebalance(df, "id", "g", alpha = 1.0, targetRows = 300L)
    val probs = kept.select("g", "keep_p").distinct().collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // alpha=1, two equal groups: both keep 0.3 — the null group counted
    // in the normalizer must also RECEIVE its share, not be dropped
    assert(probs.keySet == Set(Some("en"), None), s"null group lost: $probs")
    assert(math.abs(probs(None) - 0.3) < 1e-12)
    assert(kept.filter(col("g").isNull).count() > 0)
  }

  test("temperatureRebalance clamps tiny groups at keep-everything, stays deterministic") {
    import spark.implicits._
    val df = ((1L to 1000L).map(i => (i, "big")) ++ Seq((2001L, "tiny"), (2002L, "tiny")))
      .toDF("id", "g")
    val kept = Sampling.temperatureRebalance(df, "id", "g", alpha = 0.1, targetRows = 500L)
    val tiny = kept.filter(col("g") === "tiny")
    // alpha→0 pushes half the target at the 2-row group: clamp keeps both rows
    assert(tiny.count() == 2)
    assert(tiny.select("keep_p").distinct().collect()(0).getDouble(0) == 1.0)
    // pure function of the key: partitioning cannot change membership
    val again = Sampling.temperatureRebalance(
      df.repartition(7).sortWithinPartitions(desc("id")), "id", "g", 0.1, 500L)
    assert(rowsOf(kept) == rowsOf(again))
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons match plain split") {
    import spark.implicits._
    val docs = (1L to 400L).toDF("doc_id")
    // three synthetic near-dup clusters in dedupClustersClassed shape
    val clusters = Seq(
      (10L, Seq(10L, 11L, 12L)),
      (20L, Seq(20L, 21L)),
      (30L, Seq(30L, 31L, 32L, 33L))).toDF("keep_id", "member_ids")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters, weights)
    // every cluster is wholly inside ONE split (the leakage guarantee)
    val perCluster = out.filter(col("rep_id") =!= col("doc_id") || col("doc_id").isin(10L, 20L, 30L))
      .groupBy("rep_id").agg(countDistinct("split").as("n")).collect()
    assert(perCluster.nonEmpty && perCluster.forall(_.getLong(1) == 1L))
    // members inherit the representative's label exactly
    val label10 = out.filter(col("doc_id") === 10L).select("split").collect()(0).getString(0)
    Seq(11L, 12L).foreach { m =>
      assert(out.filter(col("doc_id") === m).select("split").collect()(0).getString(0) == label10)
    }
    // docs outside any cluster get the same label a plain split gives
    val plain = Sampling.split(docs, "doc_id", weights)
      .withColumnRenamed("split", "plain_split")
    val joined = out.filter(col("rep_id") === col("doc_id"))
      .filter(!col("doc_id").isin(10L, 11L, 12L, 20L, 21L, 30L, 31L, 32L, 33L))
      .join(plain, "doc_id")
    assert(joined.filter(col("split") =!= col("plain_split")).count() == 0)
    // total coverage: every doc labeled exactly once
    assert(out.count() == 400L)
    assert(out.filter(col("split").isNull).count() == 0)
  }

  test("mixtureRebalance: integer plan arithmetic, upsample and downsample, whitelist") {
    import spark.implicits._
    // 100 'a' rows, 20 'b' rows, 30 'c' rows (c not in the mixture)
    val df = ((1L to 100L).map((_, "a")) ++ (101L to 120L).map((_, "b")) ++
      (121L to 150L).map((_, "c"))).toDF("id", "dom")
    // total budget = corpus (150): a -> 40% = 60 rows (downsample from 100),
    // b -> 60% = 90 rows (upsample from 20: base 4, rem 10)
    val out = Sampling.mixtureRebalance(df, "id", "dom",
      Seq("a" -> 400000L, "b" -> 600000L))
    val byDom = out.groupBy("dom")
      .agg(min("n_copies").as("lo"), max("n_copies").as("hi"),
        sum("n_copies").as("rows_out"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // whitelist: 'c' never appears
    assert(byDom.keySet == Set("a", "b"))
    // a: desired 60 of 100 -> base 0, thr 6000 -> copies in {0,1}
    assert(byDom("a")._1 == 0L && byDom("a")._2 == 1L && byDom("a")._4 == 100L)
    // b: desired 90 of 20 -> base 4, rem 10, thr 5000 -> copies in {4,5}
    assert(byDom("b")._1 == 4L && byDom("b")._2 == 5L && byDom("b")._4 == 20L)
    // achieved totals land near targets (hash spread is expected-exact)
    assert(math.abs(byDom("a")._3 - 60L) <= 15L, s"a rows_out ${byDom("a")._3}")
    assert(math.abs(byDom("b")._3 - 90L) <= 8L, s"b rows_out ${byDom("b")._3}")
    // pure function of (domain, id): partitioning cannot change copies
    val again = Sampling.mixtureRebalance(
      df.repartition(7).sortWithinPartitions(desc("id")), "id", "dom",
      Seq("a" -> 400000L, "b" -> 600000L))
    assert(rowsOf(out.select("id", "n_copies")) == rowsOf(again.select("id", "n_copies")))
    // explicit budget overrides corpus size: double it, b's base doubles
    val big = Sampling.mixtureRebalance(df, "id", "dom",
      Seq("a" -> 400000L, "b" -> 600000L), totalRows = Some(300L))
    val bigB = big.filter(col("dom") === "b").agg(min("n_copies")).collect()(0).getLong(0)
    assert(bigB == 9L) // desired 180 of 20 -> base 9
  }

  test("weightedSampleExactK: exactly k rows, deterministic, non-positive weights never drawn") {
    import spark.implicits._
    val df = (1 to 500).map(i =>
      (i.toLong, if (i % 7 == 0) 0L else (i % 10 + 1).toLong)).toDF("id", "w")
    val s1 = Sampling.weightedSampleExactK(df, "id", col("w"), 40)
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSampleExactK(df.repartition(7), "id", col("w"), 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 40 && s1 == s2, "pure function of (key, weight)")
    assert(s1.forall(_ % 7 != 0), "zero-weight rows must never qualify")
  }

  test("weightedSampleExactK: inclusion tracks weight (heavy rows oversampled)") {
    import spark.implicits._
    // half the rows weight 10, half weight 1 — expect the heavy half to
    // dominate a k = 100 draw from 1000 rows
    val df = (1 to 1000).map(i =>
      (i.toLong, if (i <= 500) 10L else 1L)).toDF("id", "w")
    val drawn = Sampling.weightedSampleExactK(df, "id", col("w"), 100)
      .select("id").collect().map(_.getLong(0))
    val heavy = drawn.count(_ <= 500)
    assert(heavy > 75, s"10:1 weights should dominate the sample, got $heavy/100")
  }

  test("unimaxAllocation: waterfill caps the small source and levels the rest") {
    import spark.implicits._
    // caps 40 / 400, budget 120: A fully capped (4 epochs), B takes the
    // remaining 80 at the waterfill level
    val counts = Seq(("A", 5L, 10.0), ("B", 50L, 100.0)).toDF("src", "d", "tok")
    val r = Sampling.unimaxAllocation(counts, "src", "d", "tok",
      budget = 120.0, maxEpochs = 4.0).orderBy("source").collect()
    assert(r(0).getAs[Double]("alloc_tokens") == 40.0)
    assert(r(0).getAs[Double]("epochs") == 4.0)
    assert(r(1).getAs[Double]("alloc_tokens") == 80.0)
    assert(r(1).getAs[Double]("epochs") == 0.8)
    assert(r.map(_.getAs[Double]("alloc_tokens")).sum == 120.0)
    graft.Caches.unpersistAll()
  }

  test("unimaxAllocation: m = 0 (tight budget) and m = k (loose budget) endpoints") {
    import spark.implicits._
    val counts = Seq(("A", 1L, 10.0), ("B", 1L, 100.0)).toDF("src", "d", "tok")
    // budget 20 < even the smallest cap level: equal split, nobody capped
    val tight = Sampling.unimaxAllocation(counts, "src", "d", "tok",
      budget = 20.0, maxEpochs = 4.0).orderBy("source").collect()
    assert(tight.map(_.getAs[Double]("alloc_tokens")).toSeq == Seq(10.0, 10.0))
    assert(tight(0).getAs[Double]("epochs") == 1.0)
    assert(tight(1).getAs[Double]("epochs") == 0.1)
    // budget beyond sum(cap): everything capped at maxEpochs, budget spare
    val loose = Sampling.unimaxAllocation(counts, "src", "d", "tok",
      budget = 1000.0, maxEpochs = 4.0).orderBy("source").collect()
    assert(loose.map(_.getAs[Double]("alloc_tokens")).toSeq == Seq(40.0, 400.0))
    assert(loose.forall(_.getAs[Double]("epochs") == 4.0))
    graft.Caches.unpersistAll()
  }

  test("unimaxAllocation: a zero-token source reports NULL epochs, not 0/0") {
    import spark.implicits._
    val counts = Seq(("A", 1L, 0.0), ("B", 1L, 100.0)).toDF("src", "d", "tok")
    val r = Sampling.unimaxAllocation(counts, "src", "d", "tok",
      budget = 50.0, maxEpochs = 4.0).orderBy("source").collect()
    assert(r(0).getAs[Double]("alloc_tokens") == 0.0)
    assert(r(0).isNullAt(r(0).fieldIndex("epochs")))
    assert(r(1).getAs[Double]("alloc_tokens") == 50.0)
    graft.Caches.unpersistAll()
  }
}
