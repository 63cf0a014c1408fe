package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Thin stage orchestrator — the engine-side counterpart of the
  * reference's Airflow DAGs (ordering + retries + idempotent re-runs:
  * `pandas_based/airflow/dags/Olympic-Athletes-ETL_DAG.py:21-92` declares
  * scrape → clean I → clean II → validate → gold with 5 retries / 2 min
  * delay; `aws_migration/dags/main_aws_dag.py:9-12,153-157` the same
  * shape with 1 retry). Airflow itself is infrastructure, not engine —
  * what the engine must supply is the part users otherwise rebuild by
  * hand: dependency-ordered execution, bounded per-stage retry, and
  * marker-based skip so a re-run after a mid-pipeline crash resumes
  * instead of recomputing (the coarse-grained complement of the row-level
  * checkpoint resume in [[graft.sources.Tables.remaining]]).
  *
  * Markers are written through the Hadoop FS API, so completion state
  * lives next to the data on whatever filesystem the pipeline writes
  * (local, HDFS, S3A — see [[graft.sources.ObjectStore]]); a stage is
  * complete iff `<markerDir>/<name>._SUCCESS` exists. Stages must be
  * idempotent for the resume contract to hold (all the Olympic stages
  * are: overwrite-mode writes).
  */
object Orchestrator {

  /** One unit of work. `dependsOn` names must match other stages' names. */
  final case class Stage(name: String, dependsOn: Seq[String] = Nil)(
      val run: SparkSession => Unit)

  sealed trait Status
  case object Succeeded extends Status
  case object SkippedComplete extends Status // marker present from a prior run
  case object Failed extends Status
  case object Blocked extends Status // an upstream stage failed

  final case class StageResult(name: String, status: Status, attempts: Int,
                               error: Option[String])

  /** Dependency-ordered run. Per stage: skip if marked complete, else try
    * up to `1 + retries` times (sleeping `retryDelayMs` between tries —
    * the reference's `retry_delay`), write the marker on success.
    * A failed stage BLOCKS its transitive dependents; independent
    * branches still run (Airflow's trigger-rule default). Returns one
    * result per stage in execution order; throws on unknown dependencies
    * or cycles — a malformed DAG is a programming error, not a runtime
    * condition.
    */
  def run(spark: SparkSession, stages: Seq[Stage], markerDir: String,
          retries: Int = 1, retryDelayMs: Long = 0L): Seq[StageResult] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size, "duplicate stage names")
    stages.foreach(s => s.dependsOn.foreach(d =>
      require(byName.contains(d), s"stage ${s.name} depends on unknown stage $d")))

    // Kahn topological sort, stable on declaration order
    val order = scala.collection.mutable.ArrayBuffer.empty[Stage]
    val placed = scala.collection.mutable.Set.empty[String]
    var remaining = stages
    while (remaining.nonEmpty) {
      val (ready, waiting) = remaining.partition(_.dependsOn.forall(placed))
      require(ready.nonEmpty,
        s"dependency cycle among: ${remaining.map(_.name).mkString(", ")}")
      ready.foreach { s => order += s; placed += s.name }
      remaining = waiting
    }

    val dir = new Path(markerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def marker(name: String) = new Path(dir, s"$name._SUCCESS")

    val failed = scala.collection.mutable.Set.empty[String]
    def upstreamFailed(s: Stage): Boolean =
      s.dependsOn.exists(d => failed(d))

    order.toSeq.map { s =>
      if (upstreamFailed(s)) {
        failed += s.name // propagate transitively
        StageResult(s.name, Blocked, 0, None)
      } else if (fs.exists(marker(s.name))) {
        StageResult(s.name, SkippedComplete, 0, None)
      } else {
        var attempt = 0
        var lastErr: Option[String] = None
        var done = false
        while (!done && attempt <= retries) {
          attempt += 1
          try { s.run(spark); done = true }
          catch {
            case e: Throwable =>
              lastErr = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
              if (attempt <= retries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
          }
        }
        if (done) {
          fs.create(marker(s.name), true).close()
          StageResult(s.name, Succeeded, attempt, None)
        } else {
          failed += s.name
          StageResult(s.name, Failed, attempt, lastErr)
        }
      }
    }
  }

  /** Drop all completion markers — force the next run to recompute. */
  def reset(spark: SparkSession, markerDir: String): Unit = {
    val dir = new Path(markerDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir))
      fs.listStatus(dir).filter(_.getPath.getName.endsWith("._SUCCESS"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  // ------------------------------------------------------------------
  // Scheduling — the reference DAG's `schedule_interval='@weekly',
  // catchup=False` (Olympic-Athletes-ETL_DAG.py:12-28), engine-side
  // ------------------------------------------------------------------

  /** Fixed-interval schedule with Airflow's data-interval convention:
    * the run covering [start + k·period, start + (k+1)·period) becomes
    * due at the interval's END — a weekly job processes last week's
    * data, it does not fire the moment the week opens. `Weekly(start)`
    * is the reference DAG's literal configuration.
    */
  final case class Schedule(startEpochMs: Long, periodMs: Long) {
    require(periodMs > 0, s"period must be positive, got $periodMs")
    /** Start timestamps of every interval due at `nowMs` (end ≤ now).
      * O(n) in elapsed intervals — the CATCHUP enumeration; a
      * no-catchup tick must use [[latestDue]] instead (a minutely
      * schedule anchored years back would otherwise materialize
      * millions of period starts just to take the last).
      */
    def duePeriods(nowMs: Long): Seq[Long] = {
      val n = (nowMs - startEpochMs) / periodMs // intervals fully elapsed
      if (n <= 0) Seq.empty
      else (0L until n).map(k => startEpochMs + k * periodMs)
    }

    /** The most recent due interval's start, O(1); None before the
      * first interval closes.
      */
    def latestDue(nowMs: Long): Option[Long] = {
      val n = (nowMs - startEpochMs) / periodMs
      if (n <= 0) None else Some(startEpochMs + (n - 1) * periodMs)
    }
  }
  object Schedule {
    val WeekMs: Long = 7L * 24 * 3600 * 1000
    def weekly(startEpochMs: Long): Schedule = Schedule(startEpochMs, WeekMs)
  }

  /** One scheduler tick (call it from cron, a loop, or a test): run the
    * DAG for every due interval — all of them in order under
    * `catchup = true`, only the LATEST under `catchup = false` (the
    * reference's setting: missed weeks are skipped, not backfilled).
    * Each interval gets its own marker directory
    * `<markerRoot>/<periodStartMs>`, so the tick is IDEMPOTENT at both
    * levels: re-ticking a completed interval returns all-
    * SkippedComplete without touching data, and re-ticking after a
    * mid-DAG failure resumes exactly where [[run]]'s markers say — the
    * scheduler adds no state of its own beyond the filesystem markers
    * it already trusts. The clock is injected; production passes
    * `System.currentTimeMillis _`.
    */
  def tick(spark: SparkSession, stages: Seq[Stage], markerRoot: String,
           schedule: Schedule, clock: () => Long, catchup: Boolean = false,
           retries: Int = 1, retryDelayMs: Long = 0L)
      : Seq[(Long, Seq[StageResult])] = {
    val selected =
      if (catchup) schedule.duePeriods(clock())
      else schedule.latestDue(clock()).toSeq
    selected.map { periodStart =>
      periodStart ->
        run(spark, stages, s"$markerRoot/$periodStart", retries, retryDelayMs)
    }
  }
}
