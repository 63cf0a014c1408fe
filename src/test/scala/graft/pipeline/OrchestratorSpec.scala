package graft.pipeline

import graft.SparkSpec
import graft.pipeline.Orchestrator._

class OrchestratorSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("orch").toString

  test("stages run in dependency order; markers make re-runs skip") {
    val dir = tmpDir()
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val stages = Seq(
      Stage("gold", Seq("cleanII", "validate"))(_ => log += "gold"),
      Stage("cleanI")(_ => log += "cleanI"),
      Stage("validate", Seq("cleanII"))(_ => log += "validate"),
      Stage("cleanII", Seq("cleanI"))(_ => log += "cleanII"))
    val r1 = Orchestrator.run(spark, stages, dir)
    assert(log.toSeq == Seq("cleanI", "cleanII", "validate", "gold"))
    assert(r1.forall(_.status == Succeeded))
    // resume: everything already marked
    log.clear()
    val r2 = Orchestrator.run(spark, stages, dir)
    assert(log.isEmpty)
    assert(r2.forall(_.status == SkippedComplete))
    // reset forces recompute
    Orchestrator.reset(spark, dir)
    assert(Orchestrator.run(spark, stages, dir).forall(_.status == Succeeded))
  }

  test("a flaky stage retries; attempts are recorded") {
    val dir = tmpDir()
    var tries = 0
    val stages = Seq(Stage("flaky")(_ => {
      tries += 1
      if (tries < 3) sys.error("transient")
    }))
    val r = Orchestrator.run(spark, stages, dir, retries = 4)
    assert(r.head.status == Succeeded && r.head.attempts == 3)
  }

  test("a failed stage blocks transitive dependents, not independent branches") {
    val dir = tmpDir()
    val ran = scala.collection.mutable.Set.empty[String]
    val stages = Seq(
      Stage("a")(_ => ran += "a"),
      Stage("bad", Seq("a"))(_ => sys.error("boom")),
      Stage("child", Seq("bad"))(_ => ran += "child"),
      Stage("grandchild", Seq("child"))(_ => ran += "grandchild"),
      Stage("independent", Seq("a"))(_ => ran += "independent"))
    val r = Orchestrator.run(spark, stages, dir, retries = 1).map(x => x.name -> x).toMap
    assert(r("a").status == Succeeded)
    assert(r("bad").status == Failed && r("bad").attempts == 2)
    assert(r("bad").error.exists(_.contains("boom")))
    assert(r("child").status == Blocked && r("grandchild").status == Blocked)
    assert(r("independent").status == Succeeded)
    assert(ran == Set("a", "independent"))
    // a re-run after the bug is "fixed" resumes from the failure point
    val fixed = stages.map(s =>
      if (s.name == "bad") Stage("bad", Seq("a"))(_ => ran += "bad") else s)
    val r2 = Orchestrator.run(spark, fixed, dir, retries = 1).map(x => x.name -> x).toMap
    assert(r2("a").status == SkippedComplete)
    assert(r2("bad").status == Succeeded)
    assert(r2("child").status == Succeeded && r2("grandchild").status == Succeeded)
  }

  test("malformed DAGs fail fast: unknown dependency, cycle, duplicate name") {
    val dir = tmpDir()
    intercept[IllegalArgumentException] {
      Orchestrator.run(spark, Seq(Stage("x", Seq("nope"))(_ => ())), dir)
    }
    intercept[IllegalArgumentException] {
      Orchestrator.run(spark, Seq(
        Stage("a", Seq("b"))(_ => ()), Stage("b", Seq("a"))(_ => ())), dir)
    }
    intercept[IllegalArgumentException] {
      Orchestrator.run(spark, Seq(Stage("a")(_ => ()), Stage("a")(_ => ())), dir)
    }
  }

  test("schedule: intervals become due at their END; nothing fires early") {
    val weekly = Orchestrator.Schedule.weekly(1000L)
    val w = Orchestrator.Schedule.WeekMs
    assert(weekly.duePeriods(1000L).isEmpty, "start instant: nothing due")
    assert(weekly.duePeriods(1000L + w - 1).isEmpty, "mid-first-week: nothing due")
    assert(weekly.duePeriods(1000L + w) == Seq(1000L), "first week closes at its end")
    assert(weekly.duePeriods(1000L + 3 * w + 5) == Seq(1000L, 1000L + w, 1000L + 2 * w))
  }

  test("tick with catchup=false runs only the latest missed interval (the reference's setting)") {
    val dir = tmpDir()
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val stages = Seq(Stage("s")(_ => ran += "s"))
    val sched = Orchestrator.Schedule(0L, 100L)
    // three intervals have elapsed; only [200, 300) runs
    val got = Orchestrator.tick(spark, stages, dir, sched, () => 350L)
    assert(got.map(_._1) == Seq(200L))
    assert(got.head._2.map(_.status) == Seq(Succeeded) && ran.toSeq == Seq("s"))
    // re-tick at the same instant: idempotent, pure marker skip
    val again = Orchestrator.tick(spark, stages, dir, sched, () => 350L)
    assert(again.head._2.map(_.status) == Seq(SkippedComplete) && ran.size == 1)
    // the next interval closing fires exactly once more
    val later = Orchestrator.tick(spark, stages, dir, sched, () => 410L)
    assert(later.map(_._1) == Seq(300L) && ran.size == 2)
  }

  test("tick with catchup=true backfills every missed interval in order") {
    val dir = tmpDir()
    val ran = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stages = Seq(Stage("s")(_ => ran += ran.size.toLong))
    val sched = Orchestrator.Schedule(0L, 100L)
    val got = Orchestrator.tick(spark, stages, dir, sched, () => 350L, catchup = true)
    assert(got.map(_._1) == Seq(0L, 100L, 200L))
    assert(got.flatMap(_._2).forall(_.status == Succeeded) && ran.size == 3)
  }

  test("a failed interval resumes mid-DAG on the next tick, per-interval markers isolated") {
    val dir = tmpDir()
    var failFirst = true
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val stages = Seq(
      Stage("a")(_ => ran += "a"),
      Stage("b", Seq("a"))(_ =>
        if (failFirst) { failFirst = false; sys.error("transient") } else ran += "b"))
    val sched = Orchestrator.Schedule(0L, 100L)
    val first = Orchestrator.tick(spark, stages, dir, sched, () => 150L, retries = 0)
    assert(first.head._2.map(_.status) == Seq(Succeeded, Failed))
    // same interval, next tick: a skips via its marker, b reruns and lands
    val second = Orchestrator.tick(spark, stages, dir, sched, () => 160L, retries = 0)
    assert(second.head._2.map(_.status) == Seq(SkippedComplete, Succeeded))
    assert(ran.toSeq == Seq("a", "b"), "a must not recompute on resume")
  }

  test("drives a parquet pipeline end-to-end through the engine sinks") {
    // the DAG shape of the reference's Olympic-Athletes-ETL_DAG.py:
    // each stage writes parquet through the engine's own sink, the next
    // reads it back; a second run is a pure marker-skip
    val dir = tmpDir()
    val out = tmpDir()
    import graft.sources.Tables
    val stages = Seq(
      Stage("clean")(s => Tables.write(s.range(100).toDF("id"), s"$out/clean", files = 1)),
      Stage("gold", Seq("clean"))(s =>
        Tables.write(s.read.parquet(s"$out/clean").limit(10), s"$out/gold", files = 1)))
    assert(Orchestrator.run(spark, stages, dir).forall(_.status == Succeeded))
    assert(spark.read.parquet(s"$out/gold").count() == 10)
    assert(Orchestrator.run(spark, stages, dir).forall(_.status == SkippedComplete))
  }
}
