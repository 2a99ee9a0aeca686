package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order key correctness (vs an independent reference interleave) and
  * the locality property the key exists for: range-partitioning by zkey
  * bounds EVERY interleaved dimension's span per partition.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Independent bit-interleave reference (plain Scala, no Spark). */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- vals.indices)
      z |= ((vals(j) >> i) & 1L) << (i * vals.size + j)
    z
  }

  test("zorderKey matches the reference interleave on known and random values") {
    // known: x=0b101, y=0b011 → (y2 x2 y1 x1 y0 x0) = 0b011011 = 27
    assert(mortonRef(Seq(5L, 3L), 3) == 27L)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(Seq(x, y), 8), s"mismatch at ($x,$y)")
    }
  }

  test("three-column interleave stays within long range and round-trips bits") {
    val df = Seq((1L, 2L, 3L), (255L, 255L, 255L), (0L, 0L, 0L)).toDF("a", "b", "c")
    val out = df.select(Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].collect()
    assert(out.toSeq == Seq(mortonRef(Seq(1L, 2L, 3L), 8),
      mortonRef(Seq(255L, 255L, 255L), 8), 0L))
  }

  test("zorderKeySql is bit-for-bit the Spark expression (same-engine check)") {
    val rows = (0 until 128).map(i => ((i * 37 % 256).toLong, (i * 91 % 256).toLong))
    val df = rows.toDF("x", "y")
    val mismatches = df.select(
        Layout.zorderKey(Seq(col("x"), col("y")), 8).as("ze"),
        expr(Layout.zorderKeySql(Seq("x", "y"), 8)).as("zs"))
      .filter(col("ze") =!= col("zs")).count()
    assert(mismatches == 0L)
  }

  test("range partitioning by zkey bounds BOTH dimensions per partition") {
    // full 16x16 grid, 4 range partitions by zkey → the z-curve's four
    // quadrants: each partition spans 8 of 16 on x AND y. A plain sort by
    // x alone would leave y spanning the full domain in every partition.
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 4))
    val spans = grid.repartitionByRange(4, col("z"))
      .select(col("x"), col("y"), spark_partition_id().as("p"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length == 4)
    spans.foreach { r =>
      assert(r.getLong(1) <= 7 && r.getLong(2) <= 7,
        s"partition ${r.getInt(0)} spans x=${r.getLong(1)} y=${r.getLong(2)}")
    }
  }

  test("z-sorted files skip on BOTH dimensions; x-sorted files only on x") {
    // the actual file-skipping payoff, measured on real written files: a
    // 64x64 grid written as 16 range-partitions. Under a z-key sort each
    // file covers one 16x16 block, so a predicate on EITHER column
    // intersects only 4/16 file [min,max] ranges — footer-stats pruning.
    // Under a plain x sort the same y-predicate intersects ALL files.
    import org.apache.spark.sql.DataFrame
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def fileSpans(df: DataFrame, sortCol: String): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-z-$sortCol").toString
      df.repartitionByRange(16, col(sortCol)).sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      assert(files.size == 16)
      files.map { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1))
      }
    }
    val zSpans = fileSpans(grid.withColumn("z",
      Layout.zorderKey(Seq(col("x"), col("y")), 6)), "z")
    val xSpans = fileSpans(grid, "x")
    // predicate: y BETWEEN 0 AND 15 — count files whose y-range intersects
    def hits(spans: Seq[(Long, Long)]) =
      spans.count { case (lo, hi) => lo <= 15 && hi >= 0 }
    assert(hits(zSpans) == 4, s"z-layout should prune to 4/16 files: $zSpans")
    assert(hits(xSpans) == 16, s"x-sort cannot prune on y: $xSpans")
  }

  test("withZorderKey wraps inputs into the bit range deterministically") {
    val df = Seq((300L, 5L), (44L, 5L)).toDF("x", "y") // 300 % 256 == 44
    val keys = Layout.withZorderKey(df, Seq("x", "y"), 8).select("zkey")
      .as[Long].collect()
    assert(keys(0) == keys(1))
  }
}
