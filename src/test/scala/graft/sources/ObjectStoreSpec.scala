package graft.sources

import graft.SparkSpec

/** The sandbox has no hadoop-aws jar and no S3 endpoint, so these assert
  * the configuration CONTRACT (the exact keys the reference's MinIO /
  * LocalStack layouts require, athlete_scrape_glue.py:55-61) rather than
  * a live s3a:// round-trip. Tables itself is scheme-agnostic, so conf
  * application is the entire engine-side surface.
  */
class ObjectStoreSpec extends SparkSpec {

  test("s3aConfs covers the reference's MinIO/LocalStack key set") {
    val c = ObjectStore.s3aConfs(ObjectStore.S3Conf(
      endpoint = Some("http://localstack:4566"),
      accessKey = Some("test"), secretKey = Some("test")))
    assert(c("fs.s3a.endpoint") == "http://localstack:4566")
    assert(c("fs.s3a.access.key") == "test")
    assert(c("fs.s3a.secret.key") == "test")
    assert(c("fs.s3a.path.style.access") == "true")
    assert(c("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem")
  }

  test("real-AWS shape omits endpoint and credentials (SDK default chain)") {
    val c = ObjectStore.s3aConfs(ObjectStore.S3Conf(pathStyleAccess = false))
    assert(!c.contains("fs.s3a.endpoint") && !c.contains("fs.s3a.access.key"))
    assert(c("fs.s3a.path.style.access") == "false")
  }

  test("committerConfs selects a zero-rename commit protocol") {
    val c = ObjectStore.committerConfs()
    assert(c("fs.s3a.committer.name") == "magic")
    assert(c("spark.sql.sources.commitProtocolClass")
      .contains("PathOutputCommitProtocol"))
    assert(c("spark.sql.parquet.output.committer.class")
      .contains("BindingParquetOutputCommitter"))
  }

  test("bronze→gold round-trips on a NON-default FileSystem scheme (graftstore://)") {
    import graft.pipeline.{OlympicFixtures, OlympicPipelineMain}
    ObjectStore.configureLocalEmulator(spark)
    val base = "graftstore:" +
      java.nio.file.Files.createTempDirectory("graftstore").toString
    // bronze lands on the alternate scheme through the ordinary sink —
    // committer staging dirs + job-commit renames all run on our FS
    Map("biodata" -> OlympicFixtures.bronzeBiodata(spark),
        "results" -> OlympicFixtures.bronzeResults(spark),
        "editions" -> OlympicFixtures.bronzeEditions(spark))
      .foreach { case (n, df) => Tables.write(df, s"$base/bronze/$n.parquet") }
    // the pipeline reads bronze FROM the scheme and its gold lands on it
    val bronze = Seq("biodata", "results", "editions")
      .map(n => n -> Tables.table(spark, s"$base/bronze", n)).toMap
    val out = OlympicPipelineMain.run(bronze, OlympicFixtures.isoLookup(spark))
    out.foreach { case (n, df) => Tables.write(df, s"$base/gold/$n") }
    // all five gold tables round-trip row-identical
    val goldNames = out.keys.filterNot(_.startsWith("failure_cases")).toSeq.sorted
    assert(goldNames.size == 5, s"expected five gold tables, got $goldNames")
    goldNames.foreach { n =>
      val back = spark.read.parquet(s"$base/gold/$n")
      assert(back.inputFiles.nonEmpty && back.inputFiles.forall(_.startsWith("graftstore:")),
        s"$n must be read from the alternate scheme: ${back.inputFiles.toSeq}")
      assert(rowsOf(back) == rowsOf(out(n)), s"gold table $n drifted through $base")
    }
    // the scheme is an illusion over local disk: the committer's output
    // really moved from staging into the final directory
    val goldDir = new java.io.File(base.stripPrefix("graftstore:"), "gold")
    assert(goldDir.isDirectory && goldDir.list().toSet == out.keys.toSet)
  }

  test("configure routes hadoop keys and spark confs to the right layers") {
    val sqlKeys = Seq("spark.sql.sources.commitProtocolClass",
      "spark.sql.parquet.output.committer.class")
    val prevSql = sqlKeys.map(k => k -> spark.conf.getOption(k))
    val hc = spark.sparkContext.hadoopConfiguration
    val hadoopKeys = Seq("fs.s3a.endpoint", "fs.s3a.access.key", "fs.s3a.secret.key",
      "fs.s3a.path.style.access", "fs.s3a.impl",
      "fs.s3a.committer.name", "fs.s3a.committer.magic.enabled")
    val prevHadoop = hadoopKeys.map(k => k -> Option(hc.get(k)))
    try {
      ObjectStore.configure(spark, ObjectStore.S3Conf(
        endpoint = Some("http://minio:9000"),
        accessKey = Some("accesskey"), secretKey = Some("secretkey")))
      assert(hc.get("fs.s3a.endpoint") == "http://minio:9000")
      assert(hc.get("fs.s3a.committer.name") == "magic")
      assert(hc.get("fs.s3a.committer.magic.enabled") == "true")
      // spark-hadoop-cloud is NOT in this sandbox: the class-valued SQL
      // confs must be skipped (Spark validates them eagerly), not crash
      assert(spark.conf.getOption("spark.sql.sources.commitProtocolClass")
        != Some("org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"))
    } finally {
      // the shared session writes LOCAL parquet in other suites — leaving a
      // cloud commit protocol set would break them (class not on classpath)
      prevSql.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      prevHadoop.foreach { case (k, v) =>
        v.fold(hc.unset(k))(hc.set(k, _)) }
    }
  }
}
