package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import java.util.concurrent.atomic.AtomicInteger

/** Spec-side state shared with executor closures — valid because tests
  * run local-mode (one JVM); each test resets what it uses.
  */
object RetryRecorder {
  val sleeps = new ConcurrentLinkedQueue[Long]
  val sessions = new AtomicInteger(0)
  val attempts = new ConcurrentHashMap[Int, Integer]
  def reset(): Unit = { sleeps.clear(); sessions.set(0); attempts.clear() }

  // fixture lives here, not on the spec class: transport closures must
  // not capture the (non-serializable) suite instance
  def page(id: Int): String =
    s"""<table class="biodata">
       |<tr><th>Sex</th><td>Female</td></tr>
       |<tr><th>Used name</th><td>Athlete $id</td></tr>
       |</table>""".stripMargin
}

class RetryingFetchSpec extends SparkSpec {

  private def idsDf(ids: Seq[Int], parts: Int = 1) = {
    import spark.implicits._
    ids.toDF("athlete_id").repartition(parts)
  }

  private val noDelay = RetryingFetch.FetchPolicy(
    delayLoMs = 0, delayHiMs = 0,
    sleeper = ms => RetryRecorder.sleeps.add(ms))

  test("a flaky page succeeds on the third attempt with the reference backoff schedule") {
    RetryRecorder.reset()
    val pages = RetryingFetch.fetchPages(idsDf(Seq(1)), "athlete_id",
      () => (id: Int) => {
        val n = RetryRecorder.attempts.merge(id, 1, (a, b) => a + b)
        if (n < 3) throw new RuntimeException(s"flaky $n") else RetryRecorder.page(id)
      },
      noDelay.copy(maxAttempts = 3)).collect()
    assert(pages.length == 1 && pages(0).getString(2) == null)
    assert(pages(0).getString(1).contains("Athlete 1"))
    // reference schedule: time.sleep(1 + attempt*2) between attempts
    assert(RetryRecorder.sleeps.toArray.toSeq == Seq(1000L, 3000L),
      s"got ${RetryRecorder.sleeps.toArray.toSeq}")
  }

  test("an exhausted id becomes an error ROW with the last failure; the partition survives") {
    RetryRecorder.reset()
    val (bio, _, errors) = RetryingFetch.ingestWithRetry(
      idsDf(Seq(1, 2, 3)), "athlete_id",
      () => (id: Int) =>
        if (id == 2) throw new RuntimeException("page gone") else RetryRecorder.page(id),
      noDelay.copy(maxAttempts = 2))
    val errRows = errors.collect()
    assert(errRows.length == 1)
    assert(errRows(0).getInt(0) == 2)
    assert(errRows(0).getString(1).contains("page gone"))
    // ids 1 and 3 parse to bronze despite 2's death
    assert(bio.select("Athlete_Id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("a null page counts as a failed attempt, never an NPE or a fake success") {
    RetryRecorder.reset()
    val pages = RetryingFetch.fetchPages(idsDf(Seq(7)), "athlete_id",
      () => (_: Int) => null,
      noDelay.copy(maxAttempts = 2)).collect()
    assert(pages(0).getString(1) == null)
    assert(pages(0).getString(2).contains("null page"))
  }

  test("one session per partition, like the reference's requests.Session()") {
    RetryRecorder.reset()
    RetryingFetch.fetchPages(idsDf(1 to 40, parts = 4), "athlete_id",
      () => { RetryRecorder.sessions.incrementAndGet(); (id: Int) => RetryRecorder.page(id) },
      noDelay).collect()
    assert(RetryRecorder.sessions.get() == 4,
      s"expected 4 sessions, got ${RetryRecorder.sessions.get()}")
  }

  test("politeness delays stay in range and replay identically for a retried task") {
    def run(): Seq[Long] = {
      RetryRecorder.reset()
      RetryingFetch.fetchPages(idsDf(1 to 20), "athlete_id",
        () => (id: Int) => RetryRecorder.page(id),
        RetryingFetch.FetchPolicy(delayLoMs = 500, delayHiMs = 1500, seed = 99,
          sleeper = ms => RetryRecorder.sleeps.add(ms))).collect()
      RetryRecorder.sleeps.toArray(Array.empty[java.lang.Long]).toSeq.map(_.toLong)
    }
    val first = run()
    assert(first.length == 20)
    assert(first.forall(ms => ms >= 500 && ms < 1500), s"out of range: $first")
    assert(first.distinct.length > 1, "jitter must actually vary")
    assert(run() == first, "same seed + partition must replay the same schedule")
  }
}
