package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
  * diversified top-k — greedily pick the item maximizing
  * `relevance − redundancy` where redundancy is the max similarity to
  * anything already selected. The retrieval-side counterpart of SemDeDup:
  * instead of dropping near-duplicates from the corpus, keep them but
  * never SERVE two of them in one result set.
  *
  * Determinism discipline (the [[Cluster]] / [[graft.ext.Graph]]
  * fixed-point family): relevance and similarity are UNNORMALIZED DOT
  * PRODUCTS over 1e6-quantized integer vectors — every score is an exact
  * integer (|v|≤2e6-scale × 64 dims ≪ 2^53), so the greedy argmax (ties →
  * lowest id) is bit-identical in any engine with no rounding step. With
  * λ = 0.5, argmax λ·rel − (1−λ)·maxsim ≡ argmax (rel − maxsim).
  *
  * Scale shape: the DISTRIBUTED stage is scoring the corpus and taking
  * the top-`poolSize` candidate pool (one map-only scan +
  * TakeOrderedAndProject); the greedy reranking runs on the driver over
  * that bounded pool — poolSize×dim longs, a model-artifact-sized rerank
  * set, which is how serving rerankers work everywhere (the O(k·pool)
  * greedy is sequential by definition).
  */
object Mmr {

  /** Exact integer dot product of two quantized vectors. */
  private def dotQ(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Diversified top-k: returns (rank, vec_id, rel, penalty) — `penalty`
    * is the max dot to the already-selected set at selection time (0 for
    * the first pick).
    */
  def diversifiedTopK(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      query: Array[Float],
      k: Int,
      poolSize: Int): DataFrame = {
    require(k >= 1 && poolSize >= k, s"need 1 <= k <= poolSize; got $k/$poolSize")
    val qv = query.map(x => math.floor(x.toDouble * 1e6).toLong)
    // fused codegen'd quantize+dot scan (QuantizedDot scaladoc: the
    // composable HOF form measured 10 µs/vec at 1 M×64). The corpus scan
    // carries only (id, rel) into the TakeOrdered top-pool; the quantized
    // vector ARRAYS are materialized afterwards for the pool ids alone
    // (a second pruned scan — poolSize rows of array math, not corpus).
    val rel = graft.functions.QuantizedDot.quantized_dot(col(embCol), qv)
    val top = corpus
      .select(col(idCol).cast("long").as("vec_id"), rel.as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val poolIds = top.map(_._1)
    val vecById = corpus
      .filter(col(idCol).isin(poolIds: _*))
      .select(col(idCol).cast("long").as("vec_id"),
        Cluster.quantize(col(embCol)).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val pool = top.map { case (id, r) => (id, vecById(id), r) }
    // driver greedy over the bounded pool
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val selectedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val used = scala.collection.mutable.Set.empty[Long]
    for (rank <- 1 to math.min(k, pool.length)) {
      var best: (Long, Array[Long], Long) = null
      var bestScore = Long.MinValue
      var bestPenalty = 0L
      pool.foreach { case cand @ (id, v, r) =>
        if (!used.contains(id)) {
          val pen =
            if (selectedVecs.isEmpty) 0L
            else selectedVecs.map(sv => dotQ(v, sv)).max
          val score = r - pen
          if (score > bestScore ||
              (score == bestScore && best != null && id < best._1)) {
            best = cand; bestScore = score; bestPenalty = pen
          }
        }
      }
      used += best._1
      selectedVecs += best._2
      selected += ((rank, best._1, best._3, bestPenalty))
    }
    import spark.implicits._
    selected.toSeq.toDF("rank", "vec_id", "rel", "penalty")
  }
}
