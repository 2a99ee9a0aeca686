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
  * The map is weak-keyed by SparkContext; note the standard caveat that
  * a cached session transitively references its context, so an entry for
  * a STOPPED context is reclaimed only when the last external reference
  * to that context dies — bounded by contexts-per-JVM (one, in practice).
  */
private[graft] object LoopSessions {
  private val cache =
    new java.util.WeakHashMap[SparkContext,
      scala.collection.mutable.Map[String, SparkSession]]

  def forPurpose(caller: SparkSession, purpose: String): SparkSession =
    cache.synchronized {
      var byPurpose = cache.get(caller.sparkContext)
      if (byPurpose == null) {
        byPurpose = scala.collection.mutable.Map.empty
        cache.put(caller.sparkContext, byPurpose)
      }
      byPurpose.getOrElseUpdate(purpose, caller.newSession())
    }
}
