package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch profiling main — rewritten per investigation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    // label-mean codebook, per-dim rounded so both engines would agree
    val cents = emb.filter(col("embedding").isNotNull)
      .select(col("label").cast("long").as("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
      .select(col("cid"),
        transform(col("dims"), d => d.getField("m").cast("float")).as("cvec"))
    val exact = Similarity.bruteForceTopKAtScale(queries, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbour_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf8 = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        cents, "cid", "cvec", k = 5, nProbe = 8)
      .select(col("query_id"), col("neighbour_id"), col("cosine_sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivfSet = ivf8.map(t => (t._1, t._2)).toSet
    println(s"[scratch] ivf rows=${ivf8.length} missing=${(exact -- ivfSet).toSeq.sorted}")
    println(s"[scratch] spurious=${(ivfSet -- exact).toSeq.sorted}")
    import spark.implicits._
    val q1 = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Array[Float]].collect()(0)
    for (nb <- Seq(27L, 124L)) {
      val cv = emb.filter(col("vec_id") === nb).select("embedding")
        .as[Array[Float]].collect()(0)
      var dotFl = 0.0; var dotD = 0.0; var na = 0.0; var nb2 = 0.0
      var i = 0
      while (i < q1.length) {
        dotFl += q1(i) * cv(i)
        dotD += q1(i).toDouble * cv(i).toDouble
        na += q1(i).toDouble * q1(i); nb2 += cv(i).toDouble * cv(i)
        i += 1
      }
      println(f"[scratch] nb=$nb simF=${dotFl / math.sqrt(na * nb2)}%.12f simD=${dotD / math.sqrt(na * nb2)}%.12f")
    }
    val ex1 = exact.filter(_._1 == 1L)
    println(s"[scratch] exact q1=$ex1")
    // reproduce ivfTopK's internals for q1/27
    val corpusCells = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cvec")
      .filter(col("cell").isNotNull)
      .select(col("vec_id").as("neighbour_id"), col("cell"))
    println("[scratch] cell of 27: " +
      corpusCells.filter(col("neighbour_id") === 27).collect().mkString(","))
    val probed = Similarity.ivfTopK(queries.filter(col("vec_id") === 1), emb,
      "vec_id", "embedding", cents, "cid", "cvec", k = 500, nProbe = 8)
    val all1 = probed.filter(col("neighbour_id").isin(27, 124)).collect()
    println(s"[scratch] q1 candidates 27/124: ${all1.mkString(" | ")}")
    println(s"[scratch] q1 candidate count at nProbe=8: ${probed.count()} (want 499)")
    println("[scratch] corpus cells histogram: " + corpusCells.groupBy(col("cell"))
      .count().orderBy(col("cell")).collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    spark.stop()
  }
}
