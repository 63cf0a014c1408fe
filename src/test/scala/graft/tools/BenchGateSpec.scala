package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.sys.process._

/** Pins tools/bench_gate.py's contract — the commit-time regression
  * gate the r9 verdict asked for (the q113/q126 case would have been
  * caught before commit instead of by the judge): exit 1 on any common
  * query over the ratio gate, exit 1 on new errors, exit 0 otherwise,
  * with a noise band for sub-half-second queries.
  */
class BenchGateSpec extends AnyFunSuite {

  private def write(dir: Path, name: String, queries: Map[String, Double],
                    errors: Map[String, String] = Map.empty): String = {
    val qs = queries.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    val es = errors.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ")
    val p = dir.resolve(name)
    Files.writeString(p, s"""{"queries": {$qs}, "errors": {$es}}""")
    p.toString
  }

  private def gate(fresh: String, committed: String): Int =
    Seq("python3", "tools/bench_gate.py", fresh, committed).!(ProcessLogger(_ => ()))

  test("clean run passes; a >1.5x regression on a non-trivial query fails") {
    val dir = Files.createTempDirectory("benchgate")
    val committed = write(dir, "committed.json", Map("q1" -> 2.0, "q2" -> 4.0))
    assert(gate(write(dir, "ok.json", Map("q1" -> 2.2, "q2" -> 3.9)), committed) == 0)
    assert(gate(write(dir, "bad.json", Map("q1" -> 3.5, "q2" -> 4.0)), committed) == 1)
  }

  test("sub-half-second queries may double without flagging (noise band)") {
    val dir = Files.createTempDirectory("benchgate")
    val committed = write(dir, "committed.json", Map("qfast" -> 0.10, "q2" -> 4.0))
    assert(gate(write(dir, "noisy.json", Map("qfast" -> 0.30, "q2" -> 4.0)), committed) == 0,
      "3x on a 0.1s query is scheduler noise, not a regression")
    assert(gate(write(dir, "real.json", Map("qfast" -> 0.90, "q2" -> 4.0)), committed) == 1,
      "but 0.1s -> 0.9s clears both the ratio gate and the absolute band")
  }

  test("a query newly erroring fails the gate even if every timing is fine") {
    val dir = Files.createTempDirectory("benchgate")
    val committed = write(dir, "committed.json", Map("q1" -> 2.0, "q2" -> 4.0))
    val fresh = write(dir, "err.json", Map("q1" -> 2.0),
      errors = Map("q2" -> "AnalysisException"))
    assert(gate(fresh, committed) == 1)
  }

  test("queries only in the fresh run (newly added) never flag") {
    val dir = Files.createTempDirectory("benchgate")
    val committed = write(dir, "committed.json", Map("q1" -> 2.0))
    assert(gate(write(dir, "new.json", Map("q1" -> 2.0, "q_new" -> 99.0)), committed) == 0)
  }
}
