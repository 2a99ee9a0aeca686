package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import Stateful.{KeyedEvent, KeyStats}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState keeps running per-key stats across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val out = Stateful.runningStats(mem.toDS())
    val q = out.writeStream.format("memory").queryName("stateful")
      .outputMode("update").start()
    try {
      mem.addData(KeyedEvent(1L, ts("2024-01-01 00:00:00"), 2.0),
        KeyedEvent(1L, ts("2024-01-01 00:01:00"), 3.0))
      q.processAllAvailable()
      mem.addData(KeyedEvent(1L, ts("2024-01-01 00:02:00"), 5.0),
        KeyedEvent(2L, ts("2024-01-01 00:02:30"), 7.0))
      q.processAllAvailable()
      val rows = spark.table("stateful").as[KeyStats].collect()
      // batch 1: key1 (n=2, new). batch 2: key1 (n=3, not new), key2 (n=1, new)
      val key1Final = rows.filter(r => r.key == 1L && r.n == 3L)
      assert(key1Final.length == 1 && !key1Final.head.newKey && key1Final.head.sum == 10.0)
      val key1First = rows.filter(r => r.key == 1L && r.n == 2L)
      assert(key1First.length == 1 && key1First.head.newKey)
      val key2 = rows.filter(_.key == 2L)
      assert(key2.length == 1 && key2.head.newKey && key2.head.n == 1L)
    } finally q.stop()
  }
}
