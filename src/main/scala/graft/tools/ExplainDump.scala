package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` of selected declared queries
  * to files — the committed plan evidence under `plans/`. Usage:
  *
  * {{{ tools/run_main.sh graft.tools.ExplainDump <sfDir> <outDir> <suffix> <name...> }}}
  *
  * Each query `q` lands at `<outDir>/<q>_<suffix>.txt`. Substring match
  * on names, same as SPARK_GRAFT_BENCH_ONLY.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries
      .filter { case (n, _) => names.exists(n.contains) }
      .foreach { case (name, fn) =>
        graft.Caches.withScope {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          System.err.println(s"[explain] wrote $name")
        }
      }
    spark.stop()
  }
}
