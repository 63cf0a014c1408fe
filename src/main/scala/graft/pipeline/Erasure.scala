package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure across a table estate — the GDPR/CCPA
  * deletion pipeline as a first-class, PROVABLE operation:
  *
  *  1. every affected table is rewritten WITHOUT the subjects' rows
  *     (anti-join on the table's subject-key column);
  *  2. each rewrite commits as a [[graft.sources.VersionedTable]]
  *     snapshot — so "the data was erased, at this version, at this
  *     commit" is a durable, auditable fact (and the pre-erasure
  *     snapshot stays addressable until retention policy vacuums it,
  *     matching how regulated estates actually stage deletions);
  *  3. the returned AUDIT table states, per table: rows before, rows
  *     erased, rows after, and the committed version — the evidence a
  *     DPO files.
  *
  * Scale shape: subjects broadcast (a deletion request is small by
  * nature); each table pays one anti-join + rewrite — the unavoidable
  * cost of physical deletion on immutable storage. No table joins any
  * other table.
  */
object Erasure {

  /** One table in the erasure scope: (label, data, subject-key column). */
  case class Scope(name: String, df: DataFrame, keyCol: String)

  def erase(spark: SparkSession, subjects: DataFrame, subjectKey: String,
            scope: Seq[Scope], basePath: String): DataFrame = {
    require(scope.nonEmpty, "erasure scope must name at least one table")
    val keys = broadcast(subjects.select(col(subjectKey).as("__k")).distinct())
    scope.map { s =>
      val kept = s.df.join(keys, s.df(s.keyCol) === col("__k"), "left_anti")
      val version = graft.sources.VersionedTable.write(
        spark, kept, s"$basePath/${s.name}")
      val before = s.df.agg(count(lit(1)).as("n_before"))
      val after = kept.agg(count(lit(1)).as("n_after"))
      before.crossJoin(broadcast(after))
        .select(lit(s.name).as("table_name"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_erased"), col("n_after"),
          lit(version).as("version"))
    }.reduce(_.unionByName(_))
  }
}
