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

  /** Driver-side replay of labelSpread's fixed-point arithmetic. */
  private def refLabelSpread(
      edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)], iters: Int,
      keep: Long = 50L, scale: Long = 1000000000000L): Map[(Long, Long), Long] = {
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var mass = seeds.map { case (n, l) => (n, l) -> scale }.toMap
    for (_ <- 0 until iters) {
      val inflow = edges.flatMap { case (s, dst) =>
        mass.collect { case ((n, l), m) if n == s => (dst, l) -> m / outDeg(s) }
      }.groupBy(_._1).map { case (k, v) =>
        k -> (100L - keep) * v.map(_._2).sum / 100L
      }
      val seeded = seeds.map { case (n, l) => (n, l) -> scale * keep / 100L }.toMap
      mass = (inflow.keySet ++ seeded.keySet).map { k =>
        k -> (inflow.getOrElse(k, 0L) + seeded.getOrElse(k, 0L))
      }.toMap.filter(_._2 > 0) // mirror the loop's zero-mass pruning
    }
    mass
  }

  test("labelSpread matches the driver-side replay and labels reachable nodes") {
    // two seed camps: 1 (label 0) and 4 (label 1); 2,3 reachable from 1,
    // 5 reachable from 4; 6 reachable from both camps
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (2L, 6L), (5L, 6L), (3L, 1L), (5L, 4L))
    val seeds = Seq((1L, 0L), (4L, 1L))
    val got = Graph.labelSpread(edges.toDF("src", "dst"), seeds.toDF("node", "label"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == refLabelSpread(edges, seeds, 4))
    // argmax assignment: camp membership follows the graph
    def best(n: Long): Long =
      got.toSeq.collect { case ((`n`, l), m) => (l, m) }
        .sortBy { case (l, m) => (-m, l) }.head._1
    assert(best(2L) == 0L && best(3L) == 0L, "camp-1 nodes take label 0")
    assert(best(5L) == 1L, "camp-4 node takes label 1")
    // the mass table stays sparse: no (node, label) pair outside reach
    assert(!got.contains((3L, 1L)), "label 1 never reaches node 3")
  }

  test("labelSpread keep=100 freezes masses at the seed injection level") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val seeds = Seq((1L, 7L))
    val got = Graph.labelSpread(edges.toDF("src", "dst"), seeds.toDF("node", "label"),
      3, keep = 100)
    val m = got.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // spread weight is 0: only the seed pair survives, at full scale
    assert(m == Map((1L, 7L) -> 1000000000000L))
  }

  test("shortestPaths: BFS distances on a diamond with a shortcut") {
    //   0 → 1 → 2 → 3,  0 → 3  (shortcut),  3 → 4;  5 unreachable from 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (3L, 4L), (5L, 0L))
    val got = Graph.shortestPaths(edges.toDF("src", "dst"), source = 0L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L),
      "shortcut wins over the long path; 5 only reaches INTO the source")
  }

  test("shortestPaths: maxHops bounds the frontier; cycles terminate") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val got = Graph.shortestPaths(edges.toDF("src", "dst"), source = 0L, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), "node 3 is 3 hops out")
    // unbounded-by-cycle: full run settles every reachable node exactly once
    val full = Graph.shortestPaths(edges.toDF("src", "dst"), source = 0L, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("kCorePeel: pendant chain peels away, the clique survives") {
    // K4 on {0,1,2,3} plus a pendant chain 3-4-5: 3-core = the K4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Graph.kCorePeel(edges.toDF("src", "dst"), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      "only the K4 survives 3-core peeling; chain nodes (and node 3's " +
        "chain edge) are gone")
  }

  test("kCorePeel invariant: converged survivors all have in-subgraph degree >= k") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = Graph.kCorePeel(edges.toDF("src", "dst"), k = 5, rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 12 rounds is past convergence for 60 nodes: every survivor must
    // have degree >= 5 within the surviving subgraph
    assert(got.nonEmpty, "seeded graph is dense enough to have a 5-core")
    assert(got.values.forall(_ >= 5L), s"non-core survivor in $got")
  }

  test("kCorePeel: k above max degree empties the graph") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val got = Graph.kCorePeel(edges.toDF("src", "dst"), k = 3, rounds = 2)
    assert(got.isEmpty, "a triangle has degree 2 everywhere — no 3-core")
  }
}
