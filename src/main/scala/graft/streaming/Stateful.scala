package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key state via `flatMapGroupsWithState` — the escape hatch
  * for streaming logic the built-in window/dedup operators can't express
  * (SURVEY §2.2 custom-state row).
  *
  * State is one fixed-size value per key (bounded by key cardinality, and
  * evictable via the processing-time timeout), so a 1000-executor job
  * shards it by the groupBy key exactly like any keyed aggregation.
  */
object Stateful {

  final case class KeyedEvent(key: Long, ts: Timestamp, value: Double)
  final case class KeyStats(key: Long, n: Long, sum: Double, newKey: Boolean)

  /** Per-key state buffer (public: the codegen'd encoder instantiates it). */
  final case class St(n: Long, sum: Double)

  /** Running per-key count/sum, emitting an update per micro-batch per
    * active key; `newKey` flags a key's first-ever appearance (the
    * "have we seen this user before" primitive of enrichment pipelines).
    */
  final case class SessEvent(key: Long, ts: Timestamp)
  final case class SessionRow(key: Long, s_start: Timestamp, s_end: Timestamp, n: Long)

  /** Per-key pending sessions: (startUs, lastUs, n) sorted by start.
    * Public: the codegen'd encoder instantiates it. */
  final case class PendingSessions(sessions: Seq[(Long, Long, Long)])

  /** Gap-closed session windows via `flatMapGroupsWithState` — the
    * hand-rolled twin of `session_window` for the regime where the
    * built-in operator's per-batch sort + session-store merge dominates
    * (measured 0.45 M ev/s vs ~6 M for a plain fMGWS stage at 40 M
    * events, PERF.md round-9). Semantics match `session_window(ts, gap)`
    * exactly: sessions merge while the next event is ≤ `last + gap`,
    * `s_end = last + gap`, and a session emits (append mode) once the
    * event-time watermark passes its end — late events inside the
    * watermark can extend a pending session, exactly like the built-in.
    *
    * State per key is the PENDING sessions only (those the watermark
    * hasn't closed), so state is bounded by the watermark horizon's
    * session density — the same bound as the built-in session store, but
    * held as one compact row per key instead of one store row per
    * session. Event-time timeouts flush keys that stop receiving events.
    *
    * The caller must have applied `withWatermark` to the event stream.
    */
  def gapSessions(
      events: Dataset[SessEvent],
      gapUs: Long): Dataset[SessionRow] = {
    require(gapUs > 0, s"gap must be positive: $gapUs")
    implicit val stEnc = Encoders.product[PendingSessions]
    implicit val outEnc = Encoders.product[SessionRow]
    implicit val keyEnc = Encoders.scalaLong
    def toUs(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[SessEvent], state: GroupState[PendingSessions]) =>
          val incoming = batch.map(e => toUs(e.ts)).toArray
          java.util.Arrays.sort(incoming)
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          // merge sorted singleton events into the sorted pending
          // sessions, coalescing on the gap rule (next.start ≤ last+gap)
          val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var pi = 0; var ei = 0
          def push(s: (Long, Long, Long)): Unit =
            if (merged.nonEmpty && s._1 <= merged.last._2 + gapUs) {
              val l = merged.last
              merged(merged.length - 1) =
                (l._1, math.max(l._2, s._2), l._3 + s._3)
            } else merged += s
          while (pi < prior.length || ei < incoming.length) {
            if (ei >= incoming.length ||
                (pi < prior.length && prior(pi)._1 <= incoming(ei)))
              { push(prior(pi)); pi += 1 }
            else { push((incoming(ei), incoming(ei), 1L)); ei += 1 }
          }
          // a session is final once the watermark passes its end:
          // no admissible late event (ts ≥ watermark) can extend it
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (emit, pending) = merged.partition(_._2 + gapUs <= wmUs)
          if (pending.isEmpty) state.remove()
          else {
            state.update(PendingSessions(pending.toSeq))
            // flush once the watermark reaches the earliest pending end.
            // Spark fires an event-time timeout only when timeout <
            // watermark (STRICT), so arm 1 µs before the end — floored to
            // ms that is (end-1)/1000 — or the boundary case end == wm
            // would never get its flush invocation. Must also arm
            // strictly past the current watermark.
            val endMs = (pending.map(_._2 + gapUs).min - 1L) / 1000L
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1L))
          }
          emit.iterator.map { case (st, last, n) =>
            SessionRow(key, toTs(st), toTs(last + gapUs), n)
          }
      }
  }

  def runningStats(
      events: Dataset[KeyedEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[KeyStats] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[KeyStats]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (key: Long, batch: Iterator[KeyedEvent], state: GroupState[St]) =>
          val prev = state.getOption
          var n = prev.map(_.n).getOrElse(0L)
          var sum = prev.map(_.sum).getOrElse(0.0)
          var seen = 0
          batch.foreach { e => n += 1; sum += e.value; seen += 1 }
          state.update(St(n, sum))
          if (seen == 0) Iterator.empty
          else Iterator.single(KeyStats(key, n, sum, newKey = prev.isEmpty))
      }
  }
}
