package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor synthesizer for the empirical 10× bench: unions every
  * base table `factor` times with DISJOINT key spaces (copy k offsets
  * each key domain by k·stride, stride = max(key)+1 computed from the
  * base data), so row counts, join fan-outs, group cardinalities, and
  * graph sizes all scale ×factor while every foreign key still
  * resolves inside its own copy. nation/region are fixed dimension
  * tables (the TPC-H convention) and are copied once, unscaled.
  *
  * Two properties of union-by-copy worth knowing when reading the
  * resulting bench numbers:
  *  - copy 0 is the base data verbatim, so queries with literal id
  *    predicates (q27/q103's `vec_id < 20` probe sets) keep their exact
  *    base-query working set while the corpus under them grows ×factor;
  *  - text/embedding payloads are EXACT duplicates across copies — the
  *    dedup family therefore sees `factor`-sized identical classes
  *    (which the md5-class pre-pass collapses before any pair mining),
  *    measuring the scale path's class machinery rather than new
  *    near-dup structure. That is the honest reading of those rows.
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, inDir, outDir, factorS.toInt)
    finally spark.stop()
  }

  /** The scaling itself, session provided by the caller (main owns its
    * own; ScaleUpSpec passes the shared test session).
    */
  def run(spark: SparkSession, inDir: String, outDir: String, factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")

    def rd(n: String) = spark.read.parquet(s"$inDir/$n.parquet")
    def stride(table: String, c: String): Long = {
      val row = rd(table).agg(max(col(c).cast("long"))).head
      // max() over zero rows or an all-null key yields NULL — name the
      // offender instead of surfacing a bare NPE from getLong
      require(!row.isNullAt(0),
        s"ScaleUp: cannot derive a key stride for $table.$c " +
          "(empty table or all-null key column)")
      row.getLong(0) + 1L
    }

    // one stride per key DOMAIN (lineitem's l_orderkey shares the orders
    // domain, etc.) so cross-table references stay consistent
    val sCust = stride("customer", "c_custkey")
    val sOrd = stride("orders", "o_orderkey")
    val sPart = stride("part", "p_partkey")
    val sSupp = stride("supplier", "s_suppkey")
    val sDoc = stride("documents", "doc_id")
    val sVec = stride("embeddings", "vec_id")
    val sEv = stride("events", "event_id")
    val sUser = stride("events", "user_id")

    def scaled(name: String, offsets: Map[String, Long]): Unit = {
      val base = rd(name)
      val out = (0 until factor).map { k =>
        offsets.foldLeft(base) { case (df, (c, s)) =>
          df.withColumn(c, col(c) + lit(s * k))
        }
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name x$factor")
    }

    scaled("customer", Map("c_custkey" -> sCust))
    scaled("orders", Map("o_orderkey" -> sOrd, "o_custkey" -> sCust))
    scaled("lineitem", Map("l_orderkey" -> sOrd, "l_partkey" -> sPart, "l_suppkey" -> sSupp))
    scaled("part", Map("p_partkey" -> sPart))
    scaled("supplier", Map("s_suppkey" -> sSupp))
    scaled("documents", Map("doc_id" -> sDoc))
    scaled("embeddings", Map("vec_id" -> sVec))
    // user_id offsets too: per-user event counts stay constant under
    // scaling (the sessionization/funnel state bound scales in USERS,
    // not per-user list length — the shape a bigger corpus really has)
    scaled("events", Map("event_id" -> sEv, "user_id" -> sUser))
    // fixed dimensions: every copy's FKs point at the one true table
    Seq("nation", "region").foreach { n =>
      rd(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      println(s"[scaleup] $n x1 (dimension)")
    }
  }
}
