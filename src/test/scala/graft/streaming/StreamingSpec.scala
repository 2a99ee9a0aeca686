package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming semantics on MemoryStream (events-shaped rows): windows,
  * sessions, watermark-bounded dedup, background-query lifecycle
  * (`background` segment parity, index.js:167-173).
  */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregation with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.tumblingCounts(mem.toDF(), "ts", "event_type", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumble")
      .outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 00:01:00"), 1, "click", 1.0),
        Ev(ts("2024-01-01 00:04:00"), 1, "click", 2.0),
        Ev(ts("2024-01-01 00:11:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumble").collect()
        .map(r => (r.getAs[Timestamp]("w_start").toString, r.getAs[Long]("n"))).toMap
      assert(rows("2024-01-01 00:00:00.0") == 2L)
      assert(rows("2024-01-01 00:10:00.0") == 1L)
    } finally q.stop()
  }

  test("session window closes after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.sessionCounts(mem.toDF(), "ts", "user_id", "5 minutes", "1 minute")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 00:00:00"), 1, "a", 0),
        Ev(ts("2024-01-01 00:02:00"), 1, "a", 0),  // same session (gap 2m)
        Ev(ts("2024-01-01 00:30:00"), 1, "a", 0))  // new session
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("sessionCountsFast: gap merge, late-event absorption, watermark emission") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.sessionCountsFast(mem.toDF(), "ts", "user_id",
      "5 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessfast")
      .outputMode("append").start()
    try {
      // batch 1: u1 session forming (00:00, 00:02), u2 (00:05), u3
      // (00:12). Watermark after the batch = 00:12 − 10m = 00:02, behind
      // every session end → nothing emits
      mem.addData(
        Ev(ts("2024-01-01 00:00:00"), 1, "a", 0),
        Ev(ts("2024-01-01 00:02:00"), 1, "a", 0),
        Ev(ts("2024-01-01 00:05:00"), 2, "a", 0),
        Ev(ts("2024-01-01 00:12:00"), 3, "a", 0))
      q.processAllAvailable()
      assert(spark.table("sessfast").isEmpty,
        "nothing can finalize while the watermark is behind every session end")
      // batch 2: an out-of-order event at 00:04 (admissible: ≥ the 00:02
      // watermark) must extend u1's PENDING session, not open a new one;
      // 00:20 (u3) advances the watermark to 00:10, closing u1 (end
      // 00:04+5m = 00:09) and u2 (end 00:10, boundary ≤) but not u3
      mem.addData(
        Ev(ts("2024-01-01 00:04:00"), 1, "a", 0),
        Ev(ts("2024-01-01 00:20:00"), 3, "a", 0))
      q.processAllAvailable()
      val afterB2 = spark.table("sessfast").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"))).toSet
      assert(afterB2 == Set((1L, 3L), (2L, 1L)), s"got $afterB2")
      // batch 3: far-future event → watermark 00:50 flushes u3's two
      // sessions (00:12 and 00:20 split by the 8m > 5m gap) via timeouts
      mem.addData(Ev(ts("2024-01-01 01:00:00"), 9, "a", 0))
      q.processAllAvailable()
      val rows = spark.table("sessfast").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("s_start").toString,
          r.getAs[Timestamp]("s_end").toString, r.getAs[Long]("n"))).toSet
      assert(rows == Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:09:00.0", 3L),
        (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:10:00.0", 1L),
        (3L, "2024-01-01 00:12:00.0", "2024-01-01 00:17:00.0", 1L),
        (3L, "2024-01-01 00:20:00.0", "2024-01-01 00:25:00.0", 1L)),
        s"got $rows")
      // parity with the built-in session_window on the same replayed data
      // is certified corpus-wide by q_stream_session_fast's oracle
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamOps.dedupWithinWatermark(mem.toDF(), "ts", Seq("user_id", "event_type"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Ev(ts("2024-01-01 00:01:00"), 1, "click", 1.0), // dup within horizon
        Ev(ts("2024-01-01 00:02:00"), 2, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("background runner stops side queries when the main action ends (index.js:167-173)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Ev(ts("2024-01-01 00:00:00"), 1, "click", 1.0))
    var sideQuery: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    val result = BackgroundRunner.withBackground(() => {
      val q = mem.toDF().writeStream.format("memory").queryName("bg")
        .outputMode("append").start()
      sideQuery = Some(q)
      q
    }) {
      sideQuery.get.processAllAvailable()
      spark.table("bg").count()
    }
    assert(result == 1L)
    assert(!sideQuery.get.isActive) // destroyed when main ended
  }

  test("stream-stream interval join matches events within the lag window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user_id", $"ts".as("click_ts")),
      views.toDF().select($"user_id", $"ts".as("view_ts")),
      "user_id", "click_ts", "view_ts", "10 minutes", "5 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(ts("2024-01-01 00:00:00"), 1, "click", 0))
      views.addData(
        Ev(ts("2024-01-01 00:03:00"), 1, "view", 0),   // within 5 min → match
        Ev(ts("2024-01-01 00:09:00"), 1, "view", 0),   // beyond lag → no match
        Ev(ts("2024-01-01 00:03:00"), 2, "view", 0))   // other user → no match
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Timestamp]("view_ts") == ts("2024-01-01 00:03:00"))
    } finally q.stop()
  }

  test("command stages reject streaming input with a clear error") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val spec = graft.spec.PipelineSpec(scala.collection.immutable.ListMap(
      "bad" -> Seq(graft.spec.Stage.Command("cat -"))))
    val stream = mem.toDF().selectExpr("event_type AS value")
    val e = intercept[UnsupportedOperationException] {
      new graft.engine.Engine(spec).run("bad", spark, Some(stream))
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("foreachBatch sink lands each micro-batch as parquet (file-sink path)") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-febatch").toString
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/b$id")
      }
      .start()
    try {
      mem.addData(Ev(ts("2024-01-01 00:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val written = spark.read.parquet(s"$outDir/b*")
      assert(written.count() == 2)
    } finally q.stop()
  }

  test("streaming and batch share the same transform (unified pipeline)") {
    // the exact DataFrame=>DataFrame used in streaming runs in batch too
    val batch = Seq(
      Ev(ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(ts("2024-01-01 00:14:00"), 1, "click", 2.0)).toDF()
    val out = StreamOps.tumblingCounts(batch, "ts", "event_type", "10 minutes", "5 minutes")
    assert(out.count() == 2)
  }
}
