package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineTopKJoinSpec extends SparkSpec {

  test("planned top-k operator == window variant on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(7)
    val queries = emb.filter(col("vec_id") < 10)
    val window = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planned = Similarity.topKPlanned(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(window == planned)
  }

  test("the physical plan is CosineTopKExec (strategy actually fired)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.topKPlanned(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 2)
    df.collect() // materialize the final plan under AQE
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("CosineTopK"), s"expected the custom operator:\n$plan")
    assert(!plan.contains("Window"), "no window/shuffle of scored pairs")
  }

  test("output survives downstream relational ops (filter + agg over the node)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.topKPlanned(emb.filter(col("vec_id") < 10), emb, "vec_id", "embedding", 5)
      .filter(col("cosine_sim") > 0)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
    assert(df.collect().forall(_.getLong(1) <= 5))
  }

  test("sim values match the expression kernel to 1e-12") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val planned = Similarity.topKPlanned(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val window = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    planned.foreach { case (k, v) =>
      assert(math.abs(v - window(k)) < 1e-12, s"pair $k")
    }
  }
}
