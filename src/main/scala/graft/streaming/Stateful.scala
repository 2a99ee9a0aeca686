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
