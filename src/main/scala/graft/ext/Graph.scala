package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge lists.
  *
  * Companion to the connected-components loop in [[Dedup]] (cluster
  * labeling); this adds importance scoring. On a training-data lake the
  * natural graph is link structure (page → outlink) and the natural use is
  * curation: PageRank-style centrality as a document quality prior
  * (harmonized with the classifier gate in [[Classifier]]).
  *
  * The reference has no graph operators at all — any iteration would have
  * to be hand-looped through external stages
  * (`/root/reference/index.js:30-39` run-segments); here each round is two
  * keyed shuffles Catalyst plans like any aggregation.
  */
object Graph {

  /** Fixed-iteration PageRank in FIXED-POINT integer arithmetic.
    *
    * Ranks are scaled longs (`scale` = 1.0 of total mass). All updates are
    * integer multiply/divide/sum, so the result is bit-identical regardless
    * of partitioning, parallelism, or engine — float PageRank is
    * summation-order-dependent, which would make a cross-engine (or even
    * run-to-run, under AQE re-partitioning) hash check flaky. Integer
    * division drops sub-ulp mass (and dangling nodes leak theirs — the
    * standard local formulation); neither affects ranking fidelity at
    * `scale` = 1e12, and determinism is what a correctness-gated 100 TB
    * pipeline needs: the same crawl must score identically on every rerun.
    *
    * Update: `rank'(n) = (scale·(100-damp))/100/N  +  damp·Σ_{e:(s→n)}
    * (rank(s) div outdeg(s)) div 100` — per-round cost is one join of the
    * edge list with the (1-row-per-node) rank table on `src` plus one
    * aggregation by `dst`: two keyed shuffles, no driver data path. The
    * edge⋈outdeg join is computed ONCE and cached; rounds re-use it.
    * Lineage is cut per round with a lazy localCheckpoint exactly like the
    * CC loop ([[Dedup.connectedComponents]]).
    *
    * @param edges  (src, dst) long columns; pre-deduplicated by the caller
    *               (multi-edges weight the contribution, which is sometimes
    *               wanted — so this function does not `distinct` for you).
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      damp: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damp >= 0 && damp <= 100, s"damp must be a percentage, got $damp")
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // N is a MODEL SCALAR (like IVF centroid counts), not a data path
    val n = nodes.count()
    val base = scale * (100L - damp) / 100L / n
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // one edge-side join, reused every round: (src, dst, deg)
    val fan = e.join(outDeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    fan.count()
    e.unpersist(blocking = false)
    var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
    for (_ <- 0 until iterations) {
      val contrib = fan.join(ranks, fan("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node")
        .agg(sum("c").as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$damp * coalesce(contrib, 0L) div 100")).as("rank"))
        .localCheckpoint(eager = false)
    }
    // materialize the final round (driver-orchestrated loop, like the CC
    // loop) BEFORE releasing the cached edge fan — a lazy handoff would
    // recompute the edge⋈outdeg join once per round at first use
    ranks.count()
    nodes.unpersist(blocking = false)
    fan.unpersist(blocking = false)
    ranks
  }
}
