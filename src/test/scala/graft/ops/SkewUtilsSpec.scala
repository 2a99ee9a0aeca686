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

  test("hot-key detection finds the planted heavy hitter and nothing else") {
    // planted skew: key 7 carries 6400 rows, every other key ≤ 4. With a
    // 1-in-8 hash sample and minCount 1000, only key 7 can reach the
    // sampled cutoff of 125.
    val skewed = spark.range(0, 6400).select(lit(7L).as("k"), col("id").as("v"))
      .unionByName(spark.range(0, 400)
        .select((col("id") % 100).as("k"), (col("id") + 10000).as("v")))
    val hot = SkewUtils.hotKeys(skewed, "k", col("v"), sampleOneIn = 8, minCount = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(hot == Set(7L))
  }

  test("hot-key-selective salted join equals plain join on skewed input") {
    val left = spark.range(0, 6400).select(lit(7L).as("k"), col("id").as("v"))
      .unionByName(spark.range(0, 400)
        .select((col("id") % 100).as("k"), (col("id") + 10000).as("v")))
    val right = spark.range(0, 100).select(col("id").as("k"), (col("id") * 1.5).as("w"))
    val plain = left.join(right, "k").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val salted = SkewUtils.saltedJoinHotKeys(left, right, "k",
        distinguishing = col("v"), buckets = 8, sampleOneIn = 8, minCount = 1000)
      .select("k", "v", "w").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    assert(plain == salted)
    // and with an EMPTY hot set (threshold no key reaches) it degrades to
    // the plain join shape — still result-identical
    val unsalted = SkewUtils.saltedJoinHotKeys(left, right, "k",
        distinguishing = col("v"), buckets = 8, sampleOneIn = 8, minCount = 1000000)
      .select("k", "v", "w").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    assert(plain == unsalted)
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
