package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.pipeline.CorpusCuration
import graft.sources.Warc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming half of the q249 contract: micro-batch admission
  * against committed history must equal the cold recompute, survive
  * redelivery, and never read its own partial writes.
  */
class CrawlStreamSpec extends SparkSpec {

  import spark.implicits._

  // pages that clear extraction (≥25-char body) and the stopword-free
  // Gopher gate (50+ diverse words); d2/d4 duplicate d1/d3's token BAG
  private def words(seed: Int): String =
    (0 until 60).map(i => s"w${(seed * 31 + i * 7) % 97}token$i").mkString(" ")
  private val docs: Seq[(String, Long, String)] = Seq(
    ("srcA", 1L, words(1)),
    ("srcA", 2L, words(1)), // dup of 1, same batch
    ("srcB", 3L, words(3)),
    ("srcB", 14L, words(3)), // dup of 3, later batch
    ("srcA", 15L, words(15)),
    ("srcB", 16L, words(16)))

  private def blobFrame(rows: Seq[(String, Long, String)]): DataFrame =
    rows.groupBy(_._1).toSeq.map { case (src, rs) =>
      val blob = rs.sortBy(_._2).iterator.map { case (_, id, text) =>
        Warc.writeHttpResponse(s"<urn:uuid:doc-$id>",
          s"http://example.com/$src/$id",
          s"<html><head><title>d</title></head><body><h1>Document $id</h1><p>$text</p></body></html>"
            .getBytes(UTF_8))
      }.toArray.flatten
      (src, blob)
    }.toDF("source", "blob")

  private def coldWinners(rows: Seq[(String, Long, String)]): Set[(Long, String)] = {
    val all = CorpusCuration.curateWarcBlobs(blobFrame(rows))
    val winners = all.groupBy(col("body_md5")).agg(min(col("doc_id")).as("doc_id"))
    winners.select(col("doc_id"), col("body_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def admitted(tableDir: String): Set[(Long, String)] =
    CrawlStream.readCurated(spark, tableDir)
      .select(col("doc_id"), col("body_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("sequential micro-batch admission == cold recompute, winners min-id") {
    val table = java.nio.file.Files.createTempDirectory("crawl_admit").toString
    val batch1 = CorpusCuration.curateWarcBlobs(blobFrame(docs.filter(_._2 <= 3)))
    val batch2 = CorpusCuration.curateWarcBlobs(blobFrame(docs.filter(_._2 > 3)))
    CrawlStream.admitSink(table)(batch1, 0L)
    CrawlStream.admitSink(table)(batch2, 1L)
    val got = admitted(table)
    val cold = coldWinners(docs)
    assert(got == cold, s"admitted $got != cold $cold")
    // the fixture's dups were actually exercised
    assert(got.size == 4 && cold.map(_._1) == Set(1L, 3L, 15L, 16L))
  }

  test("redelivery is a no-op; a partial write without a marker is repaired, not read") {
    val table = java.nio.file.Files.createTempDirectory("crawl_redeliver").toString
    val batch1 = CorpusCuration.curateWarcBlobs(blobFrame(docs.filter(_._2 <= 3)))
    val batch2 = CorpusCuration.curateWarcBlobs(blobFrame(docs.filter(_._2 > 3)))
    CrawlStream.admitSink(table)(batch1, 0L)
    // simulate a crash AFTER batch 1's data landed for batch id 1 but
    // BEFORE the commit marker: orphaned fingerprints on disk
    batch2.write.mode("overwrite").parquet(s"$table/batch_1")
    // redelivery of batch 1 id=0: marker present → untouched
    CrawlStream.admitSink(table)(batch1, 0L)
    // redelivery of batch 2 id=1: must IGNORE its own orphan (else it
    // would see its own fingerprints and admit nothing)
    CrawlStream.admitSink(table)(batch2, 1L)
    assert(admitted(table) == coldWinners(docs))
    // and a second redelivery after commit changes nothing
    CrawlStream.admitSink(table)(batch2, 1L)
    assert(admitted(table) == coldWinners(docs))
  }

  test("file stream: one blob file per trigger flows funnel -> admission; set identity with cold") {
    val blobDir = java.nio.file.Files.createTempDirectory("crawl_blobs").toString
    val table = java.nio.file.Files.createTempDirectory("crawl_table").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_ckpt").toString
    blobFrame(docs.filter(_._2 <= 3)).coalesce(1)
      .write.mode("overwrite").parquet(s"$blobDir/f1")
    blobFrame(docs.filter(_._2 > 3)).coalesce(1)
      .write.mode("overwrite").parquet(s"$blobDir/f2")
    // flatten part files into the watched dir with ordered mtimes
    val fs = java.nio.file.FileSystems.getDefault
    def promote(sub: String, name: String, mtime: Long): Unit = {
      val part = new java.io.File(s"$blobDir/$sub").listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$blobDir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$blobDir/$sub"))
    }
    val t0 = System.currentTimeMillis() - 60000
    promote("f1", "0001.parquet", t0)
    promote("f2", "0002.parquet", t0 + 30000)
    assert(fs != null)
    CrawlStream.runAvailable(spark, blobDir, table, ckpt)
    // winner identity needs id-ordered batches; the SET of fingerprints
    // and one-admission-per-fingerprint hold under ANY batch order
    val got = admitted(table)
    val cold = coldWinners(docs)
    assert(got.map(_._2) == cold.map(_._2),
      s"fingerprint sets must match: ${got.map(_._2)} vs ${cold.map(_._2)}")
    assert(got.size == cold.size, "exactly one admission per fingerprint")
  }

  /** The same docs as REAL `.warc.gz` files on disk (per-record gzip
    * members), one file per source per half.
    */
  private def writeWarcFiles(dir: String, rows: Seq[(String, Long, String)],
                             tag: String): Seq[String] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rs) =>
      val bytes = rs.sortBy(_._2).iterator.map { case (_, id, text) =>
        Warc.gzipMember(Warc.writeHttpResponse(s"<urn:uuid:doc-$id>",
          s"http://example.com/$src/$id",
          s"<html><head><title>d</title></head><body><h1>Document $id</h1><p>$text</p></body></html>"
            .getBytes(UTF_8)))
      }.toArray.flatten
      val p = java.nio.file.Paths.get(dir, s"$src-$tag.warc.gz")
      java.nio.file.Files.write(p, bytes)
      p.toString
    }

  test("manifest stream: file-granular record-streamed ingest == blob-mode admission") {
    val warcDir = java.nio.file.Files.createTempDirectory("crawl_warcs").toString
    val manifestDir = java.nio.file.Files.createTempDirectory("crawl_manifests").toString
    val table = java.nio.file.Files.createTempDirectory("crawl_ftable").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_fckpt").toString
    // two dumps, each announced by a one-line-per-path manifest file
    val paths1 = writeWarcFiles(warcDir, docs.filter(_._2 <= 3), "h1")
    val paths2 = writeWarcFiles(warcDir, docs.filter(_._2 > 3), "h2")
    val t0 = System.currentTimeMillis() - 60000
    def manifest(name: String, paths: Seq[String], mtime: Long): Unit = {
      val f = new java.io.File(manifestDir, name)
      java.nio.file.Files.write(f.toPath,
        (paths.mkString("\n") + "\n").getBytes(UTF_8))
      f.setLastModified(mtime)
    }
    manifest("0001.txt", paths1, t0)
    manifest("0002.txt", paths2, t0 + 30000)
    CrawlStream.runAvailableFiles(spark, manifestDir, table, ckpt)
    val got = admitted(table)
    val cold = coldWinners(docs)
    assert(got.map(_._2) == cold.map(_._2),
      s"fingerprint sets must match: ${got.map(_._2)} vs ${cold.map(_._2)}")
    assert(got.size == cold.size, "exactly one admission per fingerprint")
    // redelivery contract carries over: re-running the same manifests
    // against the same table+checkpoint admits nothing new
    val ckpt2 = java.nio.file.Files.createTempDirectory("crawl_fckpt2").toString
    CrawlStream.runAvailableFiles(spark, manifestDir, table, ckpt2)
    assert(admitted(table) == got, "replaying the manifests must be a no-op")
  }

  test("routed stream: broadcast NB scoring in-batch, admission partitioned by language") {
    import graft.operators.LangNb
    // bilingual corpus: en docs reuse the diverse-word fixture; es docs
    // repeat a Spanish sentence (same shape LangRoutingSpec pins)
    val esText = Seq.fill(7)("el rápido zorro marrón salta sobre el perro perezoso")
      .mkString(" ")
    val biDocs: Seq[(String, Long, String)] = Seq(
      ("srcA", 1L, words(1)),
      ("srcA", 2L, words(1)), // dup of 1, same batch
      ("srcB", 3L, esText),
      ("srcB", 14L, esText), // dup of 3, later batch
      ("srcA", 15L, words(15)),
      ("srcB", 16L, esText + " distinto extra final"))
    val trainDf = Seq(
      (words(1), "en"), (words(15), "en"), (words(7), "en"),
      (esText, "es"),
      ("la señora compró naranjas y limones en el mercado pequeño", "es"),
      ("los niños juegan en el jardín durante la mañana soleada", "es"))
      .toDF("text", "lang")
    val model = LangNb.fit(trainDf, "text", "lang", n = 3, buckets = 512)

    val blobDir = java.nio.file.Files.createTempDirectory("crawl_rblobs").toString
    val table = java.nio.file.Files.createTempDirectory("crawl_rtable").toString
    val ckpt = java.nio.file.Files.createTempDirectory("crawl_rckpt").toString
    blobFrame(biDocs.filter(_._2 <= 3)).coalesce(1)
      .write.mode("overwrite").parquet(s"$blobDir/f1")
    blobFrame(biDocs.filter(_._2 > 3)).coalesce(1)
      .write.mode("overwrite").parquet(s"$blobDir/f2")
    def promote(sub: String, name: String, mtime: Long): Unit = {
      val part = new java.io.File(s"$blobDir/$sub").listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$blobDir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$blobDir/$sub"))
    }
    val t0 = System.currentTimeMillis() - 60000
    promote("f1", "0001.parquet", t0)
    promote("f2", "0002.parquet", t0 + 30000)
    val tauQ = 1000000L
    CrawlStream.runAvailableRouted(spark, blobDir, table, ckpt, model, tauQ)

    // the batch equivalent: curate whole corpus with bodies, score,
    // route, min-id dedup — the q257 composition over the q249 algebra
    val curatedAll = CorpusCuration.curateWarcBlobs(blobFrame(biDocs), keepBody = true)
    val scoredAll = LangNb.predictMargins(curatedAll, "body", model)
      .withColumn("route", when(col("margin_q") >= tauQ, col("pred_lang"))
        .otherwise(lit(graft.operators.LangRouting.QuarantineRoute)))
    val winners = scoredAll.groupBy(col("body_md5")).agg(min(col("doc_id")).as("doc_id"))
    val cold = scoredAll.join(winners, Seq("body_md5", "doc_id"), "left_semi")
      .select(col("doc_id"), col("body_md5"), col("route"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val got = CrawlStream.readCurated(spark, table)
      .select(col("doc_id"), col("body_md5"), col("route").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == cold, s"routed streamed admission must equal the batch route: $got vs $cold")
    assert(got.map(_._3).contains("en") && got.map(_._3).contains("es"),
      s"both language routes must be exercised: ${got.map(_._3)}")
    // the on-disk layout is partition-pruned per language
    val routeDirs = new java.io.File(s"$table/batch_0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(routeDirs.exists(_.startsWith("route=")),
      s"batch dirs must contain route= partition subdirs: $routeDirs")
    // redelivery still a no-op
    val ckpt2 = java.nio.file.Files.createTempDirectory("crawl_rckpt2").toString
    CrawlStream.runAvailableRouted(spark, blobDir, table, ckpt2, model, tauQ)
    assert(CrawlStream.readCurated(spark, table)
      .select(col("doc_id"), col("body_md5"), col("route").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet == got,
      "replaying the routed stream must admit nothing new")
  }
}
