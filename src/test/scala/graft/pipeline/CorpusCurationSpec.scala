package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusCurationSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val en = "the cat and the dog walk to a tree in the park with a ball and a stick it is fine that they play for hours under the old oak tree near the quiet pond today"
    Seq(
      (1L, en),                                  // good english doc
      (2L, en),                                  // exact duplicate → deduped
      (3L, "el la los las y es no un una de " * 5), // spanish → dropped at lang
      (4L, "the a of to in"),                    // english but too short → quality
      (5L, en + " extra tail tokens here")).toDF("doc_id", "text")
  }

  test("funnel counts are monotonically non-increasing through the stages") {
    val f = CorpusCuration.funnel(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("1_input") == 5)
    assert(f("2_lang_en") == 4)      // doc 3 gone
    assert(f("3_quality") == 3)      // doc 4 gone
    assert(f("4_dedup") == 2)        // doc 2 gone (duplicate of 1)
    val splitTotal = f.filter(_._1.startsWith("5_")).values.sum
    assert(splitTotal == f("4_dedup"), "splits partition the curated set")
    graft.Caches.unpersistAll()
  }

  test("curate keeps the min-id representative and labels every survivor") {
    val out = CorpusCuration.curate(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val ids = out.map(_._1).toSet
    assert(ids == Set(1L, 5L), s"min-id canonical + unique survivors: $ids")
    assert(out.forall { case (_, s) => Set("train", "val", "test")(s) })
    graft.Caches.unpersistAll()
  }
}
