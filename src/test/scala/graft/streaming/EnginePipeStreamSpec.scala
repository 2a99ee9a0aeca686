package graft.streaming

import java.nio.file.Files

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Engine
import graft.sources.Sources
import graft.spec.{PipelineSpec, Stage}
import graft.stages.{CommandStage, ModuleRegistry}

/** `gasket pipe` unbounded parity (bin.js:157-184): the SAME pipeline spec
  * built by the Engine runs over a streaming source — module/inline stages
  * are stream-agnostic DataFrame transforms, so the engine's batch planner
  * output is directly usable as a StreamingQuery. (Command stages are
  * batch-only: RDD.pipe has no streaming analog — documented limitation.)
  */
class EnginePipeStreamSpec extends SparkSpec {

  test("a module pipeline runs unchanged over a file stream (gasket pipe parity)") {
    val dir = Files.createTempDirectory("graft-stream-in")
    Files.writeString(dir.resolve("batch1.txt"), "hello world\nsecond line\n")

    val spec = PipelineSpec(ListMap("up" -> Seq(Stage.Module("uppercase"))))
    val engine = new Engine(spec, ModuleRegistry.default)

    // stdin-open analog: an unbounded text-file source through the pipeline
    val streamIn = Sources.linesStream(spark, dir.toString)
    val out = engine.run("up", spark, input = Some(streamIn))
    assert(out.isStreaming)

    val q = out.writeStream.format("memory").queryName("pipe_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows1 = spark.table("pipe_stream").collect().map(_.getString(0)).sorted
      assert(rows1.toSeq == Seq("HELLO WORLD", "SECOND LINE"))
      // stdin stays open: more data arrives, the query keeps consuming
      Files.writeString(dir.resolve("batch2.txt"), "third\n")
      q.processAllAvailable()
      val rows2 = spark.table("pipe_stream").collect().map(_.getString(0)).sorted
      assert(rows2.toSeq == Seq("HELLO WORLD", "SECOND LINE", "THIRD"))
    } finally q.stop()
  }

  test("ndjson streaming source feeds windowed aggregation end-to-end") {
    val dir = Files.createTempDirectory("graft-stream-json")
    Files.writeString(dir.resolve("e1.json"),
      """{"ts":"2024-01-01 00:01:00","event_type":"click","value":1.5}
        |{"ts":"2024-01-01 00:02:00","event_type":"click","value":2.5}
        |{"ts":"2024-01-01 01:01:00","event_type":"view","value":3.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP, event_type STRING, value DOUBLE")
    val stream = Sources.ndjsonStream(spark, dir.toString, schema)
    val agg = StreamOps.tumblingCounts(stream, "ts", "event_type", "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("ndjson_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ndjson_win")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 4.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }
}
