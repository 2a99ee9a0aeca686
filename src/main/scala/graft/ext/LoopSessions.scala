package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Memoized conf-isolated session clones, one per (SparkContext, purpose).
  *
  * The iterative operators (PageRank, label spread, connected components)
  * and conf-pinned queries (runtime bloom join) run on a `newSession()`
  * clone so their loop-tuned conf (shuffle width, AQE off, bloom
  * thresholds) never leaks into concurrent queries on the caller's
  * session. A FRESH clone per call, though, leaks a SessionState (conf,
  * catalog refs, listener registrations) per invocation in a long-lived
  * driver — reachable until GC at best. This cache hands every purpose
  * ONE clone per SparkContext, created on first use and reused forever:
  * live sessions are bounded by the number of purposes (currently 4),
  * not the number of calls.
  *
  * Contract for borrowers: set EVERY conf key you rely on at every call
  * (all call sites already do — their conf is either constant or
  * re-measured per call), because the clone keeps the previous call's
  * values. Concurrent calls of the SAME purpose share the clone, so a
  * data-derived width set by one may be observed by the other — a
  * performance-only effect: every loop here produces
  * partitioning-invariant exact-integer results, and returned DataFrames
  * are checkpoint-materialized before being rebound to the caller, so a
  * later conf change never alters an earlier result.
  *
  * The map is weak-keyed by SparkContext, but weak keying alone cannot
  * reclaim anything here — the cached sessions strongly reference their
  * context, so the key stays strongly reachable through the value. The
  * actual reclamation path is the application-end listener registered on
  * first use: `sc.stop()` evicts the context's entry, making its clones
  * and their SessionStates unreachable (JVMs that churn contexts — test
  * suites, repeated jobs — don't accumulate stopped-session state).
  */
private[graft] object LoopSessions {
  private val cache =
    new java.util.WeakHashMap[SparkContext,
      scala.collection.mutable.Map[String, SparkSession]]

  def forPurpose(caller: SparkSession, purpose: String): SparkSession =
    cache.synchronized {
      val sc = caller.sparkContext
      var byPurpose = cache.get(sc)
      if (byPurpose == null) {
        byPurpose = scala.collection.mutable.Map.empty
        cache.put(sc, byPurpose)
        sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            cache.synchronized { cache.remove(sc) }
        })
      }
      byPurpose.getOrElseUpdate(purpose, caller.newSession())
    }
}
