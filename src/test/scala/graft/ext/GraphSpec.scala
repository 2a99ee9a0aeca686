package graft.ext

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the SAME fixed-point arithmetic — the spec's
    * oracle for hand-checkable graphs.
    */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L, damp: Long = 85L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = scale * (100L - damp) / 100L / n
    var ranks = nodes.map(_ -> scale / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .map { case (s, d) => d -> ranks(s) / outDeg(s) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      ranks = nodes.map(nd => nd -> (base + damp * contrib.getOrElse(nd, 0L) / 100L)).toMap
    }
    ranks
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the driver-side fixed-point replay on a hub graph") {
    // 1..5 all point at 6; 6 points back at 1 — 6 is the hub, 1 inherits
    val edges = (1L to 5L).map(_ -> 6L) :+ (6L -> 1L)
    val got = run(edges, 5)
    assert(got == refPageRank(edges, 5))
    assert(got(6L) == got.values.max, "hub must rank highest")
    assert(got(1L) > got(2L), "hub's sole target outranks leaf nodes")
  }

  test("dangling node keeps base rank; mass never exceeds scale") {
    // 3 is a sink (in-edges only): its rank is base + damped inflow, and
    // its own mass leaks (the documented local formulation)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L))
    val got = run(edges, 4)
    assert(got == refPageRank(edges, 4))
    assert(got.values.sum <= 1000000000000L)
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("cycle converges to uniform ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(edges, 6)
    assert(got == refPageRank(edges, 6))
    // symmetric cycle: all nodes identical
    assert(got.values.toSet.size == 1)
  }

  test("multi-edges weight contributions (documented non-distinct semantics)") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = run(dup, 3)
    assert(got == refPageRank(dup, 3))
    assert(got(2L) > got(3L), "double edge 1->2 must outweigh single 1->3")
  }
}
