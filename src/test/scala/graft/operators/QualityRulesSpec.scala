package graft.operators

import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {

  private def rules(text: String): Map[String, Any] = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val row = QualityRules.ruleTable(df, "doc_id", "text").collect()(0)
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  // 60 plain English-ish words, mean length in range, two stopwords
  private val goodText = (1 to 20)
    .map(i => s"the quick fox${i} and some other plain words here")
    .mkString(" ") // heavy repetition? no — fox${i} varies each clause
    .split(" ").distinct.mkString(" ") + " " +
    (1 to 55).map(i => s"word${i}").mkString(" ")

  test("a plain document passes every rule") {
    val r = rules("the cat and the dog have walked to the old market of " +
      (1 to 60).map(i => s"town${i}").mkString(" ") + " with calm weather that day")
    assert(r("keep") == true, r)
    assert(r("r_word_count") == true && r("r_stopwords") == true)
  }

  test("word-count floor: under 50 words fails r_word_count only for that rule") {
    val r = rules("the cat and that dog have been to town with me")
    assert(r("r_word_count") == false)
    assert(r("r_stopwords") == true) // the/and/that/have/to/with present
    assert(r("keep") == false)
  }

  test("mean word length out of [3,10] fails") {
    val short = rules((1 to 60).map(_ => "a b c").mkString(" "))
    assert(short("r_mean_word_len") == false, short)
    val long = rules((1 to 60).map(i => s"pneumonoultramicroscopic${i}").mkString(" "))
    assert(long("r_mean_word_len") == false, long)
  }

  test("symbol ratio: a hash/ellipsis-heavy page fails r_symbol_ratio") {
    val r = rules((1 to 60).map(i => s"w${i} ###").mkString(" "))
    assert(r("r_symbol_ratio") == false, r)
  }

  test("bullet and ellipsis line rules") {
    val bullets = (1 to 10).map(i => s"- item number ${i} of the list").mkString("\n")
    val rb = rules(bullets)
    assert(rb("r_bullet_lines") == false, rb) // 100% bullet lines > 90%
    val ell = (1 to 10).map(i => s"teaser number ${i} keeps going...").mkString("\n")
    val re = rules(ell)
    assert(re("r_ellipsis_lines") == false, re) // 100% > 30%
    val mixed = ("- one bullet line here" +: (2 to 10).map(i => s"plain line ${i}")).mkString("\n")
    assert(rules(mixed)("r_bullet_lines") == true)
  }

  test("alphabetic-word floor: a numbers-only page fails r_alpha_words") {
    val r = rules((1 to 60).map(i => s"${i}${i}${i}").mkString(" "))
    assert(r("r_alpha_words") == false, r)
    assert(r("r_stopwords") == false) // and no stopwords either
  }

  test("stopword rule needs two DISTINCT stopwords") {
    val oneStop = rules(("the " * 30) + (1 to 30).map(i => s"w${i}x").mkString(" "))
    assert(oneStop("r_stopwords") == false, oneStop)
    val twoStops = rules("the " + "of " + (1 to 58).map(i => s"w${i}x").mkString(" "))
    assert(twoStops("r_stopwords") == true, twoStops)
  }

  test("duplicate-line cap") {
    val dup = ((1 to 7).map(_ => "this exact line repeats verbatim") ++
      (1 to 3).map(i => s"a unique line number ${i}")).mkString("\n")
    val r = rules(dup)
    assert(r("r_dup_lines") == false, r) // 6/10 duplicated > 0.30
  }

  test("repeated n-gram caps (the Gopher repetition family)") {
    val r = rules(("buy now " * 40).trim)
    assert(r("r_top_2gram") == false, r)
    assert(r("r_top_3gram") == false, r)
    val varied = rules((1 to 80).map(i => s"alpha${i} beta${i}").mkString(" "))
    assert(varied("r_top_2gram") == true, varied)
  }

  test("C4 rules: curly brace and lorem ipsum") {
    val brace = rules("function f() { return 1 } " + (1 to 60).map(i => s"w${i}x").mkString(" "))
    assert(brace("r_no_brace") == false)
    val lorem = rules("Lorem Ipsum dolor sit amet " + (1 to 60).map(i => s"w${i}x").mkString(" "))
    assert(lorem("r_no_lorem") == false)
  }

  test("null and empty text: every count zero, keep false (word floor)") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val rows = QualityRules.ruleTable(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    for (r <- rows) {
      assert(r.getAs[Long]("n_words") == 0L && r.getAs[Long]("n_lines") == 0L)
      assert(r.getAs[Boolean]("r_word_count") == false)
      assert(r.getAs[Boolean]("keep") == false)
      // vacuous rules hold on empty input (fractions define to 0)
      assert(r.getAs[Boolean]("r_dup_lines") == true)
      assert(r.getAs[Boolean]("r_top_2gram") == true)
    }
  }

  test("hostGate: a junk host drops, a clean host keeps; fail counts localize the rule") {
    import spark.implicits._
    val clean = (1 to 3).map(i =>
      (i.toLong, "good.example",
        "the cat and that dog have been to town with me " +
          (1 to 60).map(j => s"w${i}x${j}").mkString(" ")))
    val junk = (4 to 6).map(i =>
      (i.toLong, "spam.example", ("buy now " * 40).trim))
    val df = (clean ++ junk).toDF("doc_id", "host", "text")
    val got = QualityRules.hostGate(df, "doc_id", "text", "host")
      .orderBy("host").collect()
    val byHost = got.map(r => r.getAs[String]("host") -> r).toMap
    assert(byHost("good.example").getAs[Boolean]("host_keep"))
    assert(byHost("good.example").getAs[Long]("n_keep") == 3L)
    assert(!byHost("spam.example").getAs[Boolean]("host_keep"))
    assert(byHost("spam.example").getAs[Long]("n_keep") == 0L)
    // the failure counts name the sinking rules: repetition, not length
    assert(byHost("spam.example").getAs[Long]("n_fail_top_2gram") == 3L)
    assert(byHost("spam.example").getAs[Long]("n_fail_word_count") == 0L)
    assert(byHost("good.example").getAs[Long]("n_fail_top_2gram") == 0L)
  }

  test("rule pack is stream-safe: streamed ruleTable == batch (stateless projection)") {
    // a real ingest runs the quality gate ON THE STREAM — the rule pack
    // must be a stateless append-mode projection (no window/aggregate)
    val d = java.nio.file.Files.createTempDirectory("quality_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      d.resolve("documents.parquet"))
    val batchDocs = spark.read.parquet(s"$d/documents.parquet")
    val streamDocs = spark.readStream.schema(batchDocs.schema).parquet(d.toString)
    val streamed = graft.streaming.EventStreams.runToMemory(spark,
      QualityRules.ruleTable(streamDocs, "doc_id", "text"),
      "quality_rules_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = QualityRules.ruleTable(batchDocs, "doc_id", "text")
    assert(rowsOf(streamed) == rowsOf(batch))
    assert(streamed.count() > 0)
  }

  test("one projection, no shuffle, no UDF in the plan") {
    import spark.implicits._
    val df = Seq((1L, goodText)).toDF("doc_id", "text")
    val plan = QualityRules.ruleTable(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rule pack must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"rule pack must stay native:\n$plan")
  }
}
