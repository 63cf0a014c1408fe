package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level audit: no declared query may carry a Window with an EMPTY
  * partitionSpec. Empty-partition windows (a) serialize the frame
  * through one task and (b) spam the logs with WindowExec's per-task
  * "No Partition Defined" warning — the repo's convention is either a
  * partitioned window, the two-phase scan (GroupOps.exclusivePrefixSum)
  * for corpus-sized frames, or [[graft.operators.Windows.boundedGlobal]]
  * (non-foldable constant key) for bounded-by-contract frames.
  *
  * The walk is on the OPTIMIZED logical plan — `EliminateWindowPartitions`
  * runs there, so a `lit(0)` partition key that the optimizer strips IS
  * caught (the reason SingletonKey exists).
  */
class GlobalWindowAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no declared query plans an empty-partition Window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = try fn(spark, dir).queryExecution.optimizedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val bare = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bare.nonEmpty) Some(s"$name (${bare.size} bare Window(s))") else None
    }
    assert(offenders.isEmpty,
      s"queries with empty-partition Windows: ${offenders.mkString(", ")}")
  }
}
