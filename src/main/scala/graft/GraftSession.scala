package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point (tests, bench, verify)
  * shares. Tuned for `local[32]` here, but nothing below is local-only: AQE,
  * UTC session time, and a shuffle-partition count sized to the parallelism
  * are what we'd set on a real cluster too (where shuffle.partitions scales
  * with executor cores instead of 32).
  */
object GraftSession {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is parquet TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read as Long (ns since epoch) and normalize via
      // Tables.withEventTime where a real timestamp is needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
