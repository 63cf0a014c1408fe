package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2 (or a
  * §7.4 LLM-pipeline extension), expressed through the graft library, run on
  * the driver-provided TPC-H-ish testdata. [[oracleSql]] carries the
  * DuckDB-equivalent SQL for the correctness gate; keys without SQL get the
  * weaker rows-only check (noted inline).
  *
  * The query surface itself lives in per-family registries under
  * [[graft.queries]] (relational / dedup+similarity / text+multimodal /
  * events+streaming / stats+sampling) — this object is the thin
  * composition the driver and the specs call.
  *
  * Float parity with DuckDB: raw column passthrough is bit-exact; any
  * REaggregated double is wrapped in round(_, 2..6) so the two engines'
  * summation orders can't flip the hash.
  */
object SparkEntry {

  private val registries: Seq[QueryRegistry] = Seq(
    RelationalQueries, DedupSimilarityQueries, TextMultimodalQueries,
    EventsStreamingQueries, StatsSamplingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join star query: fact lineitem ⨝ orders ⨝ customer with broadcast
    * nation/region dims, revenue per nation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = registries.map(_.queries)
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum,
      "duplicate query keys across family registries")
    all
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] = {
    val parts = registries.map(_.oracleSql)
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum,
      "duplicate oracle keys across family registries")
    require(all.keySet.subsetOf(queries.keySet),
      "oracle keys must be declared queries")
    all
  }

  /** Streaming-state audit the bench main drives (not a query: asserts
    * mapGroupsWithState funnel state against the batch funnel).
    */
  def funnelStateAudit(s: SparkSession, dir: String): Unit =
    EventsStreamingQueries.funnelStateAudit(s, dir)
}
