package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fit: deterministic codebooks, correct shape, empty-cell survival") {
    val cb1 = Pq.fit(embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    val cb2 = Pq.fit(embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    assert(cb1.m == 8 && cb1.ksub == 16 && cb1.dsub == 8)
    // same input, same sample, same init => identical codebooks
    (0 until 8).foreach(s => (0 until 16).foreach(j =>
      assert(java.util.Arrays.equals(cb1.cents(s)(j), cb2.cents(s)(j)),
        s"codebook ($s,$j) not deterministic")))
  }

  test("encode: codes in range, nearest-centroid by construction") {
    import spark.implicits._
    val cb = Pq.fit(embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    val codes = Pq.encode(embeddings, "vec_id", "embedding", cb).collect()
    assert(codes.length == embeddings.count())
    codes.foreach(c => assert(c.code.length == 8 && c.code.forall(j => j >= 0 && j < 16)))
    // spot-check one vector by hand: every subspace code is the argmin
    val v = embeddings.orderBy("vec_id").select(col("embedding"))
      .as[Array[Float]].head()
    val c0 = codes.minBy(_.id)
    (0 until 8).foreach { s =>
      val dists = (0 until 16).map { j =>
        (0 until 8).map { t =>
          val d = v(s * 8 + t).toDouble - cb.cents(s)(j)(t).toDouble
          d * d
        }.sum
      }
      assert(dists(c0.code(s)) == dists.min, s"subspace $s code not argmin")
    }
  }

  test("quantization error shrinks with training iterations") {
    import spark.implicits._
    val vecs = embeddings.select(col("embedding")).as[Array[Float]].collect()
    def mse(cb: Pq.Codebooks): Double = vecs.map { v =>
      val code = Pq.encodeVec(v, cb)
      (0 until cb.m).map { s =>
        (0 until cb.dsub).map { t =>
          val d = v(s * cb.dsub + t).toDouble - cb.cents(s)(code(s))(t).toDouble
          d * d
        }.sum
      }.sum
    }.sum / vecs.length
    val e0 = mse(Pq.fit(embeddings, "vec_id", "embedding", 8, 16, iters = 0))
    val e5 = mse(Pq.fit(embeddings, "vec_id", "embedding", 8, 16, iters = 5))
    assert(e5 < e0 * 0.8, s"training must cut reconstruction MSE: $e0 -> $e5")
  }

  test("adcTopK: ADC distance equals the table-free reconstruction distance; recall holds") {
    import spark.implicits._
    val cb = Pq.fit(embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    val queries = embeddings.filter(col("vec_id") < 5)
    val codes = Pq.encode(embeddings, "vec_id", "embedding", cb)
    val hits = Pq.adcTopK(queries, codes, "vec_id", "embedding", cb, k = 10).collect()
    assert(hits.groupBy(_.getLong(0)).forall(_._2.length == 10))

    val vecs = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val codeMap = codes.collect().map(c => c.id -> c.code).toMap
    // ADC(q, v) must equal sum_s ||q_s - cents(s)(code_v(s))||^2 exactly
    hits.foreach { r =>
      val (qid, nid, adc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val q = vecs(qid)
      val manual = (0 until cb.m).map { s =>
        (0 until cb.dsub).map { t =>
          val d = q(s * cb.dsub + t).toDouble - cb.cents(s)(codeMap(nid)(s))(t).toDouble
          d * d
        }.sum
      }.sum
      assert(math.abs(adc - manual) < 1e-9, s"ADC mismatch for ($qid,$nid)")
    }
    // raw-ADC recall@10 at 32x compression on this high-entropy corpus
    // is a fixed deterministic number (0.34; independently reproduced
    // in numpy) — the bound guards regressions, the real retrieval
    // number is the refined path below
    val recalls = hits.groupBy(_.getLong(0)).map { case (qid, rs) =>
      val q = vecs(qid)
      val exact = vecs.toSeq.map { case (id, v) =>
        (id, v.indices.map { t =>
          val d = q(t).toDouble - v(t).toDouble
          d * d
        }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      val got = rs.map(_.getLong(1)).toSet
      (exact intersect got).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"raw-ADC mean recall@10 regressed: $mean")
  }

  test("adcTopKRefined: shortlist + exact re-rank recovers the true neighbourhood") {
    import spark.implicits._
    val cb = Pq.fit(embeddings, "vec_id", "embedding", m = 8, ksub = 16, iters = 5)
    val queries = embeddings.filter(col("vec_id") < 5)
    val codes = Pq.encode(embeddings, "vec_id", "embedding", cb)
    val refined = Pq.adcTopKRefined(queries, embeddings, codes,
      "vec_id", "embedding", cb, k = 10, shortlist = 50).collect()
    val vecs = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def exact10(qid: Long): Seq[Long] = {
      val q = vecs(qid)
      vecs.toSeq.map { case (id, v) =>
        (id, v.indices.map { t =>
          val d = q(t).toDouble - v(t).toDouble
          d * d
        }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    }
    // re-ranked dists are exact, so ORDER must match exact search for
    // every shortlisted member; recall is deterministic (0.78 here)
    val recalls = refined.groupBy(_.getLong(0)).map { case (qid, rs) =>
      val got = rs.sortBy(_.getInt(3)).map(_.getLong(1))
      val truth = exact10(qid)
      // order agreement on the common prefix: first returned IS the
      // true nearest whenever it made the shortlist
      assert(got.head == truth.head || !got.contains(truth.head),
        s"re-rank must put the true nearest first (q=$qid)")
      (truth.toSet intersect got.toSet).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"refined recall@10 too low: $mean")
    // shortlist == corpus size => exact search, recall 1.0 by construction
    val full = Pq.adcTopKRefined(queries, embeddings, codes,
      "vec_id", "embedding", cb, k = 10, shortlist = vecs.size).collect()
    full.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq == exact10(qid),
        s"shortlist=corpus must equal exact search (q=$qid)")
    }
  }

  test("ivfPqTopK: full probe + full shortlist == exact search; partial probe keeps recall") {
    import spark.implicits._
    val n = embeddings.count().toInt
    val centroids = embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = embeddings.filter(col("vec_id") < 5)
    // ground truth: exact double-L2 top-10 per query, self included
    // (matching the cell scan), ties (dist, id)
    val vecs = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def exact10(qid: Long): Seq[Long] = {
      val qv = vecs(qid)
      vecs.toSeq.map { case (id, v) =>
        val d = (0 until qv.length).map { t =>
          val x = qv(t).toDouble - v(t).toDouble; x * x
        }.sum
        (d, id)
      }.sortBy { case (d, id) => (d, id) }.take(10).map(_._2)
    }
    // exactness limit: probe every cell, shortlist the whole corpus —
    // residual encoding and cell routing must drop out entirely
    val full = Pq.ivfPqTopK(queries, embeddings, "vec_id", "embedding",
      centroids, "cid", "cvec", m = 8, ksub = 16, iters = 5,
      k = 10, nProbe = 8, shortlist = n).collect()
    full.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq == exact10(qid),
        s"full probe + full shortlist must equal exact search (q=$qid)")
    }
    // the production regime: half the cells, bounded shortlist — recall
    // floor through BOTH approximation layers (deterministic pipeline)
    val part = Pq.ivfPqTopK(queries, embeddings, "vec_id", "embedding",
      centroids, "cid", "cvec", m = 8, ksub = 16, iters = 5,
      k = 10, nProbe = 4, shortlist = 64).collect()
    val recalls = part.groupBy(_.getLong(0)).map { case (qid, rs) =>
      (rs.map(_.getLong(1)).toSet intersect exact10(qid).toSet).size.toDouble / 10
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"ivfpq recall@10 too low at nProbe=4: $mean")
  }
}
