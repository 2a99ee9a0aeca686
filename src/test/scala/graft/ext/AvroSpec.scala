package graft.ext

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro OCF source/sink: the full type envelope round-trips exactly, the
  * union-null idiom survives, and — the scale property — ONE container
  * file fans out across many input splits via the sync-marker protocol.
  */
class AvroSpec extends SparkSpec {

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("f", FloatType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dt", DateType, nullable = true)))

  test("full type matrix round-trips value-exact (nulls included)") {
    val ts = Timestamp.valueOf("2026-01-15 10:00:00.123456")
    val rows = Seq(
      Row(1L, 7, 3.5, 2.25f, true, "héllo ✓", Array[Byte](1, 2, -1),
        ts, Date.valueOf("2026-01-15")),
      Row(2L, -7, -0.0, 0.5f, false, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), fullSchema)
    val out = "/tmp/graft_avro_spec_types"
    Avro.write(df, out)
    val back = Avro.read(spark, out).orderBy("id").collect()
    assert(back.length == 2)
    val r1 = back(0)
    assert(r1.getLong(0) == 1L && r1.getInt(1) == 7 && r1.getDouble(2) == 3.5)
    assert(r1.getFloat(3) == 2.25f && r1.getBoolean(4))
    assert(r1.getString(5) == "héllo ✓")
    assert(r1.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, -1))
    assert(r1.getAs[Timestamp](7) == ts) // micros fidelity
    assert(r1.getAs[Date](8).toString == "2026-01-15")
    val r2 = back(1)
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7) && r2.isNullAt(8))
    // read-side schema reconstructs nullability from the union
    val st = Avro.read(spark, out).schema
    assert(!st("id").nullable && st("s").nullable)
  }

  test("one OCF file fans out across sync-marker splits (the 100 TB path)") {
    import spark.implicits._
    val n = 200000
    val df = (0 until n).map(i => (i.toLong, s"row $i payload padding $i"))
      .toDF("id", "txt").coalesce(1) // ONE file by construction
    val out = "/tmp/graft_avro_spec_split"
    // small sync interval → many independently-seekable blocks
    Avro.write(df, out, codec = "deflate", syncInterval = 4096)
    val fine = Avro.read(spark, out, maxSplitBytes = 64 * 1024)
    assert(fine.rdd.getNumPartitions > 4,
      s"expected many splits over one file, got ${fine.rdd.getNumPartitions}")
    assert(fine.count() == n) // no row lost or doubled at split seams
    assert(fine.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == n.toLong * (n - 1) / 2)
  }

  test("unsupported types fail loudly at the sink, not silently coerce") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[Exception](Avro.write(df, "/tmp/graft_avro_spec_bad"))
    assert(e.getMessage.contains("unsupported"))
  }
}
