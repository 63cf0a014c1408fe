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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def current() = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.95)").as("p95"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("a50"),
      expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("a95"))
    def fused() = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, array(0.5, 0.95))").as("p"),
      expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)").as("a"))
    time("current cold")(noop(current()))
    time("current warm")(noop(current()))
    time("fused cold")(noop(fused()))
    time("fused warm")(noop(fused()))
    spark.stop()
  }
}
