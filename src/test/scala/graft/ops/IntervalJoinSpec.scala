package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probes = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 21L), (6L, 95L), (7L, 200L)
  ).toDF("probe_id", "x")

  private lazy val intervals = Seq(
    (10L, 0L, 10L),    // catches 5, 10 (inclusive ends)
    (11L, 10L, 20L),   // catches 10, 19, 20 — and overlaps interval 10 at x=10
    (12L, 90L, 130L),  // spans several buckets at width 10
    (13L, 300L, 310L)  // matches nothing
  ).toDF("interval_id", "s", "e")

  private def pairs(width: Long): Set[(Long, Long)] =
    IntervalJoin.containment(probes, "x", intervals, "s", "e", width)
      .select("probe_id", "interval_id").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L), (6L, 12L))

  test("containment matches the naive quadratic join, once per pair, any width") {
    val naive = probes.crossJoin(intervals)
      .filter(col("x").between(col("s"), col("e")))
      .select("probe_id", "interval_id").as[(Long, Long)].collect()
    assert(naive.length == naive.toSet.size && naive.toSet == expected)
    // width smaller than, equal to, and larger than the interval spans —
    // exactly one row per matching pair in every case (a probe lives in
    // ONE bucket, so no dedup pass is needed)
    for (w <- Seq(3L, 10L, 64L, 1000L)) {
      val got = IntervalJoin.containment(probes, "x", intervals, "s", "e", w)
        .select("probe_id", "interval_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet == expected, s"wrong pairs at width $w")
    }
  }

  test("binned plan is a keyed shuffle join, not a nested-loop join") {
    val out = IntervalJoin.containment(probes, "x", intervals, "s", "e", 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the naive formulation of the same predicate IS nested-loop — the
    // operator exists precisely to avoid this plan
    val naive = probes.join(intervals, col("x").between(col("s"), col("e")))
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
