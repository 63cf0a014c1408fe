package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One per-family slice of the [[graft.SparkEntry]] query surface.
  *
  * The surface grew past 9k lines in one file; each family object holds
  * its query builders, the `queries` name→builder map, and the DuckDB
  * `oracleSql` restatements for the driver's correctness gate.
  * [[graft.SparkEntry]] composes the slices and asserts key
  * disjointness — the external contract (`SparkEntry.queries` /
  * `SparkEntry.oracleSql` / `SparkEntry.entry`) is unchanged.
  */
private[graft] trait QueryRegistry {

  /** Shared table loader (the former SparkEntry.t). */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.table(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame]

  def oracleSql: Map[String, String]
}
