package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only probe for the bimodal multi-second stalls observed on some
  * JVM instances during iterative/dedup queries (q95/q113/q49 band):
  * runs the q95 path once and prints per-Spark-job wall time PLUS the
  * driver-side GAP since the previous job — if the seconds live in the
  * gaps, the stall is driver-side (RPC/broadcast/analysis), not
  * executor compute. Usage: tools/run_main.sh graft.tools.StallProbe <sfDir>
  */
object StallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = System.nanoTime()
    val t00 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val gap = (System.nanoTime() - lastEnd) / 1e9
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(js.jobId, (System.nanoTime(), desc))
        if (gap > 0.2)
          println(f"[probe] GAP ${gap}%6.2fs before job ${js.jobId} @${(System.nanoTime() - t00) / 1e9}%6.2fs $desc")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEnd = System.nanoTime()
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          val dur = (System.nanoTime() - t0) / 1e9
          if (dur > 0.2)
            println(f"[probe] JOB ${je.jobId}%4d ${dur}%6.2fs @${(System.nanoTime() - t00) / 1e9}%6.2fs $desc")
        }
      }
    })

    // warm like Bench: flagship once
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      println(s"[probe] ===== q95 round $round =====")
      graft.Caches.withScope {
        graft.SparkEntry.queries("q95_cluster_resolve")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      }
      println(f"[probe] ===== q95 round $round total ${(System.nanoTime() - t0) / 1e9}%6.2fs =====")
    }
    spark.stop()
  }
}
