package graft.ext

import org.apache.spark.sql.functions._

/** Arrow IPC file (Feather v2) sink -> source: type envelope, nulls,
  * multi-batch files, per-partition file layout.
  */
class ArrowIpcSpec extends graft.SparkSpec {

  test("round-trip: all envelope types + nulls across batch boundaries") {
    val df = spark.range(0, 10000, 1, 3).select(
      col("id"),
      col("id").cast("int").as("i"),
      (col("id") * 0.5).as("d"),
      (col("id") % 2 === 0).as("b"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 7 === 0, lit(null)).otherwise(concat(lit("n"), col("id")))
        .as("opt"),
      to_timestamp(lit("2026-01-15 10:00:00")).as("ts"))
    val out = "/tmp/graft_arrow_spec"
    ArrowIpc.write(df, out, batchRows = 512) // 10k rows -> ~7 batches/file
    val back = ArrowIpc.read(spark, out)
    assert(back.schema.fieldNames.toSeq ==
      Seq("id", "i", "d", "b", "s", "opt", "ts"))
    assert(back.count() == 10000)
    // file-per-partition layout
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".arrow")) == 3)
    val rows = back.orderBy("id").collect()
    assert(rows(4).getLong(0) == 4L && rows(4).getInt(1) == 4)
    assert(rows(4).getDouble(2) == 2.0 && rows(4).getBoolean(3))
    assert(rows(4).getString(4) == "s4" && rows(4).getString(5) == "n4")
    assert(rows(7).isNullAt(5)) // id=7 -> null opt
    assert(rows(3).getTimestamp(6).toString.startsWith("2026-01-15 10:00:00"))
    // exact content equality vs the source
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("one file fans out batch-parallel: many tasks, same rows") {
    val df = spark.range(0, 20000, 1, 1) // ONE partition -> ONE file
      .select(col("id"), (col("id") * 2).as("v"))
    val out = "/tmp/graft_arrow_fan"
    ArrowIpc.write(df, out, batchRows = 1000) // 20 batches in one file
    val back = ArrowIpc.read(spark, out, batchesPerTask = 4)
    assert(back.rdd.getNumPartitions == 5) // 20 blocks / 4 per task
    assert(back.count() == 20000)
    assert(back.agg(sum("v")).head.getLong(0) == (0L until 20000L).map(_ * 2).sum)
    // per-file fast path (no footer peeks): same rows, one task
    val whole = ArrowIpc.read(spark, out, batchesPerTask = 0)
    assert(whole.rdd.getNumPartitions == 1)
    assert(whole.count() == 20000)
  }

  test("binary columns round-trip byte-exact") {
    val sqlc = spark
    import sqlc.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.emptyByteArray))
      .toDF("k", "blob")
    ArrowIpc.write(df, "/tmp/graft_arrow_bin")
    val back = ArrowIpc.read(spark, "/tmp/graft_arrow_bin").orderBy("k").collect()
    assert(back(0).getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).getAs[Array[Byte]]("blob").isEmpty)
  }

  test("unsupported types fail loudly, missing dirs throw") {
    val sqlc = spark
    import sqlc.implicits._
    val bad = Seq((1, Seq(1, 2))).toDF("k", "arr")
    intercept[Exception] { ArrowIpc.write(bad, "/tmp/graft_arrow_bad") }
    intercept[Exception] { ArrowIpc.read(spark, "/tmp/graft_arrow_nope_missing") }
  }
}
