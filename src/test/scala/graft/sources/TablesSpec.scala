package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {

  test("writePartitioned: filters on partition columns prune directories") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("order_year", year(col("o_orderdate")))
    val path = java.nio.file.Files.createTempDirectory("part_orders").toString
    Tables.writePartitioned(orders, path, Seq("order_year"))

    // layout: one directory per year
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("order_year=")) && dirs.length >= 5)

    val pruned = spark.read.parquet(path).filter(col("order_year") === 1995)
    pruned.collect() // force final AQE plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"expected partition pruning in scan:\n$plan")
    // correctness: same rows as filtering the unpartitioned source
    assert(pruned.count() ==
      orders.filter(col("order_year") === 1995).count())
  }

  test("writeBucketed: bucketed self-join plans without a shuffle exchange") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS cust_bucketed")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory survives — clear the orphaned location too
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "cust_bucketed")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    Tables.writeBucketed(cust, "cust_bucketed", Seq("c_custkey"), 4)
    val t = spark.table("cust_bucketed")
    val joined = t.as("a").join(t.as("b"), "c_custkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides share bucketing on the join key: SMJ with no Exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == cust.count())
  }

  test("latestCheckpoint: greatest numeric suffix wins; checkpoint 0 counts") {
    val dir = java.nio.file.Files.createTempDirectory("ckpts")
    assert(Tables.latestCheckpoint(spark, dir.toString).isEmpty)
    Seq("ckpt_0", "ckpt_2", "ckpt_10", "not_a_checkpoint").foreach { n =>
      java.nio.file.Files.createDirectory(dir.resolve(n))
    }
    val got = Tables.latestCheckpoint(spark, dir.toString)
    assert(got.exists(_.endsWith("ckpt_10")), s"numeric (not lexicographic) order: $got")
    // checkpoint 0 alone is still a checkpoint (reference quirk §2.13.9)
    val dir0 = java.nio.file.Files.createTempDirectory("ckpt0")
    java.nio.file.Files.createDirectory(dir0.resolve("ckpt_0"))
    assert(Tables.latestCheckpoint(spark, dir0.toString).exists(_.endsWith("ckpt_0")))
    assert(Tables.latestCheckpoint(spark, "/nonexistent/path").isEmpty)
  }

  test("jsonLines and textLines scans with pinned schemas") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("src_fmt")
    val jsonPath = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(jsonPath,
      """{"id": 1, "text": "hello world"}
        |{"id": 2, "text": "zweite zeile"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("text", StringType)))
    val js = Tables.jsonLines(spark, jsonPath.toString, schema)
    assert(js.count() == 2 && js.columns.toSeq == Seq("id", "text"))
    val txtPath = dir.resolve("corpus.txt")
    java.nio.file.Files.writeString(txtPath, "line one\nline two\nline three\n")
    val txt = Tables.textLines(spark, txtPath.toString)
    assert(txt.count() == 3 && txt.columns.toSeq == Seq("value"))
  }

  test("remaining: left-anti resume semantics") {
    import spark.implicits._
    val all = Seq(1, 2, 3, 4, 5).toDF("id")
    val done = Seq(2, 4).toDF("id")
    val got = Tables.remaining(all, done, "id").collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 3, 5))
  }

  test("writeWithManifest: per-file rows sum to the dataset; manifest is reader-invisible") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("manifest").toString + "/t"
    val df = (1L to 500L).map(i => (i, s"d$i")).toDF("id", "v").repartition(4)
    val manifest = Tables.writeWithManifest(df, path)
    val rows = manifest.collect()
    assert(rows.map(_.getLong(1)).sum == 500L, "row counts must sum to the dataset")
    assert(rows.forall(_.getLong(2) > 0L), "every file has bytes")
    assert(rows.length == 4)
    // _manifest must not leak into a normal read of the data directory
    assert(spark.read.parquet(path).count() == 500L)
    // and the manifest itself round-trips
    val back = spark.read.parquet(s"$path/_manifest")
    assert(rowsOf(back) == rowsOf(manifest))
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("orc_rt").toString + "/t"
    val df = (1L to 100L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "name", "score")
    Tables.writeOrc(df, path)
    val back = Tables.orc(spark, path)
    assert(rowsOf(back) == rowsOf(df))
    val filtered = back.filter(col("id") > 90L).select("id")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)")
      || plan.contains("GreaterThan(id,90)"), s"filter must reach the ORC scan:\n$plan")
  }

  test("JSONL round-trip preserves content, including newlines and unicode in strings") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain text", 10L),
      (2L, "line\nbreak\tand \"quotes\"", 20L),
      (3L, "unicode: héllo wörld ✓", 30L),
      (4L, null.asInstanceOf[String], 0L)
    ).toDF("id", "text", "n")
    val path = java.nio.file.Files.createTempDirectory("jsonl_rt").toString + "/docs"
    Tables.writeJsonLines(df, path)
    val back = Tables.jsonLines(spark, path, df.schema)
    assert(rowsOf(back) == rowsOf(df),
      "JSON escaping must round-trip newlines, quotes, unicode, nulls")
  }
}
