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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.{Components, Dedup}
    time("warm")(docs.select("doc_id","text","lang").write.format("noop").mode("overwrite").save())
    // rebuild the core pieces inline to count them
    val toks = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
      Dedup.hashedShingleSet(docs, col("text"), 1).as("toks"))
    val classes = toks.groupBy(col("blk"), col("toks"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .withColumn("cls", xxhash64(col("blk"), col("toks"))).persist()
    println("[scratch] classes: " + time("classes")(classes.count()))
    val cp = classes.as("a").join(classes.as("b"),
        col("a.blk") === col("b.blk") && col("a.cls") < col("b.cls"))
      .withColumn("__inter", call_function("sorted_intersect_size", col("a.toks"), col("b.toks")))
      .withColumn("jaccard", col("__inter").cast("double") /
        (size(col("a.toks")) + size(col("b.toks")) - col("__inter")))
      .filter(col("jaccard") >= 0.8)
      .select(col("a.cls").as("cls_a"), col("b.cls").as("cls_b")).persist()
    println("[scratch] class pairs: " + time("mine class pairs")(cp.count()))
    val comp = time("components")(graft.Caches.withScope {
      val c = Components.connectedComponents(cp, "cls_a", "cls_b",
        allIds = classes.select(col("cls")), idCol = "cls").persist()
      println("[scratch] labeled nodes: " + c.count()); c })
    spark.stop()
  }
}
