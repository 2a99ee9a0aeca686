package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Memoized conf-isolated session clones per (SparkContext, purpose).
  *
  * The iterative operators (PageRank, label spread, connected components)
  * and conf-pinned queries (runtime bloom join) run on a `newSession()`
  * clone so their loop-tuned conf (shuffle width, AQE off, bloom
  * thresholds) never leaks into concurrent queries on the caller's
  * session. A FRESH clone per call, though, leaks a SessionState (conf,
  * catalog refs, listener registrations) per invocation in a long-lived
  * driver — reachable until GC at best. Two lending disciplines:
  *
  *   - [[forPurpose]] — ONE shared clone per purpose, for borrowers whose
  *     conf is CONSTANT across calls (the bloom join pins the same
  *     thresholds every time) and whose returned DataFrames stay lazy, so
  *     the conf must out-live the call. Concurrent same-purpose calls
  *     share it — harmless exactly because the conf never differs.
  *   - [[withLoopSession]] — a LEASED pool per purpose, for loops that
  *     set DATA-DERIVED conf (edge-count shuffle widths): concurrent
  *     same-purpose calls get DISTINCT clones, so one call's width is
  *     never observed by another in flight. The pool grows to peak
  *     concurrency and is reused forever after; sequential callers keep
  *     paying zero session setup (the round-10 win). Results MUST be
  *     materialized inside the lease (all loop sites checkpoint + count
  *     before returning) because the clone's conf may be retuned the
  *     moment it is released.
  *
  * Live sessions are bounded by purposes × their peak concurrency, not
  * by call count. The map is weak-keyed by SparkContext, but weak keying
  * alone cannot reclaim anything here — the cached sessions strongly
  * reference their context, so the key stays strongly reachable through
  * the value. The actual reclamation path is the application-end
  * listener registered on first use: `sc.stop()` evicts the context's
  * entry, making its clones and their SessionStates unreachable (JVMs
  * that churn contexts — test suites, repeated jobs — don't accumulate
  * stopped-session state).
  */
private[graft] object LoopSessions {
  private final class Pool {
    val shared = scala.collection.mutable.Map.empty[String, SparkSession]
    // (clone, leased?) per purpose — flags guarded by `cache`'s lock
    val leased = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[(SparkSession, Array[Boolean])]]
  }

  private val cache = new java.util.WeakHashMap[SparkContext, Pool]

  private def poolOf(caller: SparkSession): Pool = {
    val sc = caller.sparkContext
    var pool = cache.get(sc)
    if (pool == null) {
      pool = new Pool
      cache.put(sc, pool)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          cache.synchronized { cache.remove(sc) }
      })
    }
    pool
  }

  /** The shared clone for a CONSTANT-conf purpose (see discipline above).
    * Set every conf key you rely on at every call — the clone keeps the
    * previous call's values.
    */
  def forPurpose(caller: SparkSession, purpose: String): SparkSession =
    cache.synchronized {
      poolOf(caller).shared.getOrElseUpdate(purpose, caller.newSession())
    }

  /** Run `body` on a clone leased for its duration: concurrent
    * same-purpose calls never share one. Materialize results inside.
    */
  def withLoopSession[T](caller: SparkSession, purpose: String)(
      body: SparkSession => T): T = {
    val (clone, flag) = cache.synchronized {
      val entries = poolOf(caller).leased
        .getOrElseUpdate(purpose, scala.collection.mutable.ArrayBuffer.empty)
      entries.find(!_._2(0)) match {
        case Some((s, f)) => f(0) = true; (s, f)
        case None =>
          val entry = (caller.newSession(), Array(true))
          entries += entry
          entry
      }
    }
    try body(clone)
    finally cache.synchronized { flag(0) = false }
  }
}
