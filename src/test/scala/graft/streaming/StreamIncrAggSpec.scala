package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Multi-batch drive of the q_stream_incr_agg pattern: several input
  * files, one micro-batch each (maxFilesPerTrigger=1), partials appended
  * per batch — the serve-time merge must equal the batch aggregate over
  * everything ingested, and the log must actually contain one partial
  * set per batch (proving the append-only maintenance shape, not a
  * single-shot rewrite).
  */
class StreamIncrAggSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch appended partials merge to the batch truth") {
    val base = s"/tmp/graft_test_incragg_${System.nanoTime()}"
    val in = s"$base/in"
    val log = s"$base/log"
    val ck = s"$base/ck"
    // three files -> three micro-batches
    for (i <- 0 until 3)
      (0 until 100).map { j =>
        val id = i * 100 + j
        (id.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 10:00:00"),
          s"type${j % 2}", (j % 7).toDouble)
      }.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(in)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("sum_v"))
          .write.mode("append").parquet(log)
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val merged = spark.read.parquet(log)
      .groupBy("day", "event_type")
      .agg(sum("n").cast("long").as("n"), sum("sum_v").cast("double").as("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val truth = spark.read.parquet(in)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(merged == truth, "serve-time merge must equal the batch aggregate")
    assert(truth.size == 6, "3 days x 2 types")
    // append-only maintenance: each of the 3 batches appended its own
    // partial rows (6 per batch: 1 day x 2 types x ... actually 2 rows
    // per batch -> the log holds 3x the merged group count for its day)
    val logRows = spark.read.parquet(log).count()
    assert(logRows == 6, s"one partial row per (batch-day, type): $logRows")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }
}
