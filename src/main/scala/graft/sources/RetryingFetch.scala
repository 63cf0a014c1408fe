package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The fetch-side retry loop of the reference's scraper, as an engine
  * operator (athlete_scrape_glue.py:157-212 `scrape_partition`,
  * athlete_scrape.py:174-188): one SESSION per partition, a randomized
  * politeness delay before every id, a bounded attempt loop with linear
  * backoff, and — the part that matters at scale — an exhausted id
  * becomes an ERROR ROW, never a task failure: one dead page must not
  * kill a 100k-page partition (or, at 100 TB, retry a whole task's worth
  * of successful fetches).
  *
  * What is deliberately NOT here: a concrete HTTP transport. The sandbox
  * has zero egress, so `openSession` is the caller's (exactly where the
  * reference constructs `requests.Session()`); everything the reference
  * wraps AROUND its transport — session lifecycle, delay, retry,
  * backoff, error routing — is real, deterministic, and spec-covered.
  * Time is injected (`sleeper`) so specs run instantly and assert the
  * exact sleep schedule; jitter is seeded per partition, so reruns of a
  * task produce the identical delay sequence (a retried Spark task
  * repeats the same politeness schedule instead of re-rolling it).
  */
object RetryingFetch {

  /** Retry/backoff/politeness policy, reference-shaped defaults:
    * `maxAttempts` = RETRY_NUM (3), `backoffMs(attempt)` = 1s + attempt·2s
    * (athlete_scrape_glue.py:186 `time.sleep(1 + attempt * 2)`), delay
    * uniform in [delayLoMs, delayHiMs) (`random.uniform(0.5, 1.5)` —
    * set both to 0 to disable in tight loops/tests).
    */
  final case class FetchPolicy(maxAttempts: Int = 3,
                               backoffMs: Int => Long = a => 1000L + a * 2000L,
                               delayLoMs: Long = 500L,
                               delayHiMs: Long = 1500L,
                               seed: Long = 7L,
                               sleeper: Long => Unit = Thread.sleep) {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    require(delayLoMs <= delayHiMs, s"bad delay range [$delayLoMs, $delayHiMs)")
  }

  /** Fetch every id through the policy → (id, html, error): html null on
    * failure, error null on success (exactly one is set — the
    * reference's ('error', {...}) yield becomes a column). `openSession`
    * runs once per PARTITION; the session function may throw or return
    * null — both count as a failed attempt, and the LAST failure's
    * message is what the error row records.
    */
  def fetchPages(ids: DataFrame, idCol: String,
                 openSession: () => Int => String,
                 policy: FetchPolicy = FetchPolicy()): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("int")).as[Int].mapPartitions { it =>
      val session = openSession() // per-partition, like requests.Session()
      val rng = new scala.util.Random(
        policy.seed ^ TaskContext.getPartitionId().toLong)
      it.map { id =>
        if (policy.delayHiMs > 0) {
          val span = policy.delayHiMs - policy.delayLoMs
          val jitter = if (span == 0) 0L else rng.nextLong(span)
          policy.sleeper(policy.delayLoMs + jitter)
        }
        var html: String = null
        var lastErr: String = null
        var attempt = 0
        while (html == null && attempt < policy.maxAttempts) {
          if (attempt > 0) policy.sleeper(policy.backoffMs(attempt - 1))
          try {
            html = session(id)
            if (html == null) lastErr = s"null page for id $id"
          } catch {
            case e: Exception =>
              lastErr = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          }
          attempt += 1
        }
        if (html != null) (id, html, null: String) else (id, null: String, lastErr)
      }
    }.toDF(idCol, "html", "error")
  }

  /** Fetch + parse + error routing, the whole reference stage: returns
    * (biodata, results, errors) where `errors` is (id, error_message) —
    * feed it to [[Tables.writeErrors]] (S8) and the ids stay visible to
    * the next run's [[Tables.remaining]] resume anti-join only once they
    * succeed. The fetched pages are PERSISTED here, not by the caller:
    * three frames hang off one side-effecting fetch, and an unpersisted
    * plan would re-run every HTTP call (and re-sleep the politeness
    * schedule) per materialized output — release via the usual
    * [[graft.Caches.withScope]] once the outputs are written.
    */
  def ingestWithRetry(ids: DataFrame, idCol: String,
                      openSession: () => Int => String,
                      policy: FetchPolicy = FetchPolicy())
      : (DataFrame, DataFrame, DataFrame) = {
    val pages = graft.Caches.track(
      fetchPages(ids, idCol, openSession, policy).persist())
    val ok = pages.filter(col("error").isNull).select(col(idCol), col("html"))
    val errors = pages.filter(col("error").isNotNull)
      .select(col(idCol), col("error").as("error_message"))
    val (bio, results) = HtmlIngest.parseBronze(ok, idCol, "html")
    (bio, results, errors)
  }
}
