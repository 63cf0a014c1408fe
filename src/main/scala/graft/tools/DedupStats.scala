package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH quality instrumentation for the SURVEY §9 scale adjudication:
  * measures, on a documents table (typically a [[ScaleUp]] `perturb`
  * synthesis — the realistic near-duplicate regime), the numbers that
  * decide whether MinHash-LSH is doing its job at scale:
  *
  *  - `cand_pairs`:     class-level candidate pairs the banding admits
  *                      (post-distinct — the verify stage's input size)
  *  - `verified_pairs`: candidates whose EXACT token-set Jaccard clears
  *                      the threshold (the output)
  *  - `precision`:      verified / candidates — how much verify work the
  *                      banding wastes
  *  - `exact_pairs` + `recall` (with the `exact` flag): ground truth from
  *                      the all-pairs classed miner; verification is
  *                      exact, so recall = verified / exact directly
  *
  * Class-level on purpose: the miners' own first move is the md5 content
  * collapse, so class pairs are the unit the LSH machinery actually
  * processes (doc-pair counts just multiply by class sizes).
  *
  * `ngram` selects the shingle width the signatures run on — the knob
  * that decides whether LSH survives a high-baseline-overlap corpus:
  * on synthetic small-vocab text, unrelated same-lang docs average
  * ~0.63 UNIGRAM token-set Jaccard (so near-threshold banding admits
  * almost every pair — measured 87%+ candidate rates), while their
  * BIGRAM-shingle Jaccard averages ~0.03 (banding admits ~nothing but
  * true near-dups). The 100 TB configuration is ngram >= 2.
  *
  * Usage: runMain graft.tools.DedupStats <dir> [threshold] [ngram] [exact]
  * Prints ONE JSON line, same contract as Bench.
  */
object DedupStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error(
      "usage: DedupStats <dir> [threshold] [ngram] [exact]"))
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.95)
    val ngram = args.lift(2).filter(_ != "exact").map(_.toInt).getOrElse(1)
    val wantExact = args.contains("exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dir, threshold, wantExact, ngram)
    finally spark.stop()
  }

  def run(spark: SparkSession, dir: String, threshold: Double,
          wantExact: Boolean, ngram: Int = 1): Unit = {
    import graft.operators.Dedup
    graft.expressions.GraftFunctions.register(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    // the miners' own first move: collapse identical content per block
    val reps = docs
      .groupBy(col("lang"), md5(trim(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("cls"), first(col("text")).as("text"))
      .select(col("cls"), col("lang"), col("text"))
      .cache()
    val nClasses = reps.count()

    // replicate minhashDupPairsClassed's banding stage (same autoBanding
    // policy, restated: smallest band count whose at-threshold miss
    // probability is ≤ 1e-6, else (48, 24))
    val (k, b) = Seq((48, 6), (48, 8), (48, 12), (48, 16)).find { case (kk, bb) =>
      val r = kk / bb
      math.pow(1 - math.pow(threshold, r.toDouble), bb.toDouble) <= 1e-6
    }.getOrElse((48, 24))
    val r = k / b
    val withBand = reps.select(
      col("cls"), col("lang").as("blk"),
      call_function("minhash_signature",
        Dedup.hashedShingleSet(reps, col("text"), ngram), lit(k)).as("sig"))
      .withColumn("band", explode(Dedup.lshBands(col("sig"), b, r)))
      .select(col("cls"), col("blk"),
        col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
    val candidates = withBand.as("a")
      .join(withBand.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.blk") === col("b.blk") &&
          col("a.cls") < col("b.cls"))
      .select(col("a.cls").as("id_a"), col("b.cls").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .cache()
    val candPairs = candidates.count()

    val toks = reps.select(col("cls"),
      Dedup.hashedShingleSet(reps, col("text"), ngram).as("toks"))
    val verifiedPairs = candidates
      .join(toks.withColumnsRenamed(Map("cls" -> "id_a", "toks" -> "ta")), "id_a")
      .join(toks.withColumnsRenamed(Map("cls" -> "id_b", "toks" -> "tb")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .filter(col("jaccard") >= threshold)
      .count()

    // ground truth: the all-pairs classed miner on the SAME reps (each
    // class is one row, so its output IS class pairs). Quadratic-ish —
    // opt in explicitly.
    val exactPairs =
      if (wantExact)
        Some(Dedup.jaccardPairsClassed(reps, "cls", "text", "lang", threshold, ngram).count())
      else None

    val precision = if (candPairs == 0) 1.0 else verifiedPairs.toDouble / candPairs
    val recall = exactPairs.map(e =>
      if (e == 0) 1.0 else verifiedPairs.toDouble / e)
    val json =
      s"""{"metric":"dedup_stats","dir":"$dir","threshold":$threshold,"ngram":$ngram,""" +
      s""""num_hashes":$k,"bands":$b,"rows_per_band":$r,""" +
      s""""n_docs":$nDocs,"n_classes":$nClasses,""" +
      s""""cand_pairs":$candPairs,"verified_pairs":$verifiedPairs,""" +
      s""""precision":${f"$precision%.6f"}""" +
      exactPairs.map(e => s""","exact_pairs":$e,"recall":${f"${recall.get}%.6f"}""").getOrElse("") +
      "}"
    println(json)
    val out = sys.env.get("SPARK_GRAFT_STATS_OUT")
    out.foreach { p =>
      val w = new java.io.PrintWriter(p); try w.println(json) finally w.close()
    }
  }
}
