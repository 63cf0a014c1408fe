package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted intermediates.
  *
  * Several operators (the classed dedup miners, [[operators.GroupOps.denseId]])
  * `persist()` a mid-plan table because it feeds 3–5 plan branches; the
  * cache must live until the RETURNED DataFrame is materialized, so the
  * operator itself can never safely unpersist. Without cleanup, a
  * long-lived session running the dedup family accumulates cached class
  * tables until memory-pressure eviction.
  *
  * Scoping: a process-global registry alone is wrong for concurrent
  * queries (Spark supports concurrent actions on one session) — query A's
  * cleanup would unpersist query B's still-live class tables mid-query, a
  * silent recomputation cliff. [[track]] therefore registers into the
  * CALLING THREAD's active [[withScope]] scope when one is open, falling
  * back to the global registry otherwise. Plans are constructed on the
  * caller's thread, so thread-locality is exactly invocation-locality:
  *
  *   - Concurrent drivers: wrap each query in `Caches.withScope {
  *     build-and-materialize }` — caches release when the scope closes,
  *     and scopes on different threads never touch each other.
  *   - Sequential drivers (Bench, Verify): either works; both use
  *     [[withScope]].
  *   - Bare callers: tracked globally; call [[unpersistAll]] whenever no
  *     query is in flight.
  */
object Caches {

  /** One invocation's tracked caches; closed exactly once. */
  final class Scope private[Caches] () {
    private[Caches] val dfs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def close(): Unit = {
      var df = dfs.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = dfs.poll()
      }
    }
  }

  private val global = new Scope()
  private val current = new ThreadLocal[Scope]() // null => no open scope

  /** Register an operator-internal persisted DataFrame; returns it. */
  def track(df: DataFrame): DataFrame = {
    val scope = Option(current.get()).getOrElse(global)
    scope.dfs.add(df)
    df
  }

  /** Run `body` (plan construction AND materialization) under a fresh
    * scope; every cache tracked by this thread inside `body` is
    * unpersisted on exit (also on failure). Nests: the previous scope is
    * restored afterwards.
    */
  def withScope[A](body: => A): A = {
    val outer = current.get()
    val scope = new Scope()
    current.set(scope)
    try body
    finally {
      current.set(outer)
      scope.close()
    }
  }

  /** Unpersist every GLOBALLY tracked intermediate (non-blocking) and
    * clear the registry. Safe whenever no un-scoped query is in flight.
    */
  def unpersistAll(): Unit = global.close()
}
