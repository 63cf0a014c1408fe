package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch profiling main — rewritten per investigation. */
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
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    import graft.operators.Quantize
    time("kernel cold")(noop(Quantize.quantizeReport(emb, "vec_id", "embedding")))
    time("kernel warm")(noop(Quantize.quantizeReport(emb, "vec_id", "embedding")))
    time("declarative cold")(noop(Quantize.quantizeReportDeclarative(emb, "vec_id", "embedding")))
    time("declarative warm")(noop(Quantize.quantizeReportDeclarative(emb, "vec_id", "embedding")))
    spark.stop()
  }
}
