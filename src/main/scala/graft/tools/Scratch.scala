package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad (not part of the engine surface):
  * times individual pieces of a query to locate the dominant cost.
  * Edit freely between runs; keep out of SparkEntry.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.operators.Dedup

    time("warm scan")(noop(docs.select("doc_id", "text", "lang")))

    // old declarative toks vs fused kernel, n=1
    val oldToks = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
      array_sort(transform(Dedup.tokenSet(col("text")), t => xxhash64(t))).as("toks"))
    val newToks = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
      Dedup.hashedShingleSet(docs, col("text"), 1).as("toks"))
    time("old toks n=1")(noop(oldToks))
    time("new toks n=1")(noop(newToks))
    time("old toks n=1 again")(noop(oldToks))
    time("new toks n=1 again")(noop(newToks))

    def classed(toks: DataFrame): DataFrame = {
      val classes = toks.groupBy(col("blk"), col("toks"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .withColumn("cls", xxhash64(col("blk"), col("toks")))
        .persist()
      classes.count()
      classes
    }
    val c1 = time("classes old")(classed(oldToks))
    val c2 = time("classes new")(classed(newToks))
    println("[scratch] n classes old=" + c1.count() + " new=" + c2.count())
    c1.unpersist(); c2.unpersist()

    time("full q23")(graft.Caches.withScope {
      noop(graft.SparkEntry.queries("q23_jaccard_pairs")(spark, dir))
    })
    time("full q23 again")(graft.Caches.withScope {
      noop(graft.SparkEntry.queries("q23_jaccard_pairs")(spark, dir))
    })
    spark.stop()
  }
}
