package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    val salted = SkewUtils.saltedAggregate(
      li, Seq("l_returnflag"),
      distinguishing = col("l_orderkey"),
      buckets = 8,
      partialAggs = Seq(
        sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
        count(lit(1)).as("pn")),
      finalAggs = Seq(
        sum(col("ps")).cast("double").as("s"),
        sum(col("pn")).as("n")))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(plain == salted)
  }

  test("salted join equals plain join") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val right = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "w")
    val plain = left.join(right, "k").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val salted = SkewUtils.saltedJoin(left, right, "k",
        distinguishing = col("v"), buckets = 4)
      .select("k", "v", "w").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    assert(plain == salted)
  }

  test("salt is deterministic and bounded") {
    val df = Tables.orders(spark, sfDir)
      .select(SkewUtils.salt(col("o_orderkey"), 16).as("s"))
    val vals = df.distinct().collect().map(_.getLong(0))
    assert(vals.forall(s => s >= 0 && s < 16))
    val again = Tables.orders(spark, sfDir).repartition(7)
      .select(SkewUtils.salt(col("o_orderkey"), 16).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = df.groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == again)
  }
}
