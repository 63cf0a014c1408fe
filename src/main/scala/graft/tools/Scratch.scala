package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.Dedup
    time("q24 cold")(graft.Caches.withScope { noop(graft.SparkEntry.queries("q24_minhash_lsh")(spark, dir)) })
    time("q24 warm")(graft.Caches.withScope { noop(graft.SparkEntry.queries("q24_minhash_lsh")(spark, dir)) })
    // pieces
    val toks = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
      Dedup.hashedShingleSet(docs, col("text"), 1).as("toks"))
    val classes = toks.groupBy(col("blk"), col("toks"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .withColumn("cls", xxhash64(col("blk"), col("toks"))).persist()
    time("classes")(classes.count())
    val sig = call_function("minhash_signature", col("toks"), lit(32))
    val banded = classes.withColumn("band", explode(Dedup.lshBands(sig, 16, 2)))
      .select(col("cls"), col("blk"), col("band.band_idx").as("bi"), col("band.band_hash").as("bh"))
    time("banded")(noop(banded))
    val cand = banded.as("a").join(banded.as("b"),
      col("a.bi") === col("b.bi") && col("a.bh") === col("b.bh") &&
      col("a.blk") === col("b.blk") && col("a.cls") < col("b.cls"))
      .select(col("a.cls").as("ca"), col("b.cls").as("cb")).dropDuplicates("ca","cb").persist()
    println("[scratch] candidates: " + time("candidates")(cand.count()))
    spark.stop()
  }
}
