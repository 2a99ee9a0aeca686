package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.SparkSpec

/** Bridge.rebind: zero-copy logical-plan hand-off between sessions of the
  * same SparkContext, used by the connected-components loop for conf
  * isolation (AQE off + measured shuffle width on a clone, never on the
  * caller's session).
  */
class BridgeSpec extends SparkSpec {
  import spark.implicits._

  test("rebind plans under the target session's conf, caller untouched") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val clone = spark.newSession()
    clone.conf.set("spark.sql.shuffle.partitions", "3")
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    val rebound = Bridge.rebind(clone, df.groupBy("k").count())
    // same rows either way
    assert(rebound.collect().map(r => (r.getInt(0), r.getLong(1))).toMap ==
      df.groupBy("k").count().collect().map(r => (r.getInt(0), r.getLong(1))).toMap)
    // the rebound plan took the CLONE's shuffle width…
    val widths = rebound.rdd.getNumPartitions
    assert(widths == 3, s"expected the clone's 3 shuffle partitions, got $widths")
    // …and the caller's session conf is untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "3")
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") != "false")
  }

  test("rebind result composes with caller-session frames") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val clone = spark.newSession()
    val rebound = Bridge.rebind(clone, base.filter(col("id") === 1L))
    // joining a clone-bound frame back to a caller-bound frame must work
    // (same SparkContext) — the nearDupClusters shape
    val joined = base.join(
      Bridge.rebind(spark, rebound).withColumnRenamed("v", "w"), "id")
    assert(joined.collect().map(_.getString(2)).toSeq == Seq("a"))
  }
}
