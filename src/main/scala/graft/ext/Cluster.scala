package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-checkable Lloyd's k-means over embedding columns.
  *
  * [[Similarity.trainIvfCentroids]] is the float-space production trainer
  * (collects only the k×dim centroid artifact per round). Its arithmetic is
  * anchored indirectly, through IVF recall contracts — this module adds the
  * direct cross-engine certificate: the SAME Lloyd's update computed in
  * quantized integer space, where every step is exact and therefore
  * bit-identical regardless of partitioning, summation order, or engine
  * (the [[Graph.pageRank]] fixed-point discipline applied to clustering).
  *
  * Quantization: component `x` → `floor(x · 1e6)` as a long. All distance
  * terms are exact integers below 2^53, so even the double-typed distance
  * accumulation is exact; centroid updates use `floor(sum/count)` on
  * exact-in-double integer sums — reproducible in any engine with IEEE
  * doubles, expressible in ANSI SQL for the DuckDB oracle.
  *
  * Scale shape (the [[Similarity.trainIvfCentroids]] division of labor):
  * centroids are a k×dim MODEL ARTIFACT — collected to the driver each
  * round and re-broadcast as literals, never a data path. Assignment is
  * then MAP-ONLY (argmin over the literal centroid array — no k×-row
  * crossJoin, no per-point shuffle of the vectors), and the update is one
  * dim-bounded aggregate: per-cell component sums as `dim` columns with
  * map-side partial aggregation, k×(dim+1) values total crossing the wire
  * per round. A first-cut crossJoin + min-struct + posexplode formulation
  * measured 375 µs/vec at 100 k×64; this shape is ~20× cheaper and is
  * what survives a 100 TB corpus.
  */
object Cluster {

  /** Component-wise quantization to integer micro-units. `floor`, not
    * cast-truncation: Spark's double→long cast truncates toward zero while
    * SQL CAST in DuckDB rounds — floor is the one portable choice.
    */
  def quantize(embCol: Column): Column =
    transform(embCol, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Map-only nearest-cell column: the codegen'd exact-integer argmin
    * kernel ([[graft.functions.NearestCellQ]]) with the centroid matrix
    * as a plan reference object; distance ties break to the lowest cell
    * id — the oracle's `ORDER BY dist, cell`.
    */
  private def nearestCell(v: Column, cents: Seq[(Long, Array[Long])]): Column =
    graft.functions.NearestCellQ.nearest_cell_q(v, cents)

  /** `iters` full Lloyd rounds from the deterministic seed (the k lowest
    * `idCol` vectors), returning the final per-point assignment
    * `(id, cell, v)`. Ties in distance break toward the lowest cell id. A
    * cell that loses all members drops out (deterministically — the
    * oracle mirrors the same rule).
    */
  def assignments(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val points = embeddings.select(
      col(idCol).cast("long").as("id"), quantize(col(embCol)).as("v"))
    val dim = points.select(size(col("v"))).head().getInt(0)
    // seed centroids: the k lowest-id vectors — k rows, a model artifact.
    // ORDER BY id LIMIT k (not `id < k`): correct for sparse, offset, or
    // hashed id spaces, where a dense-id filter would under-seed or come
    // back empty. Cell labels are the seed ids themselves.
    var cents: Seq[(Long, Array[Long])] = points
      .orderBy("id").limit(k).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Long](1).toArray)
      .toSeq
    require(cents.nonEmpty, "k-means needs at least one input vector")
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("v"), i + 1)).as(s"s$i"))
    for (_ <- 1 to iters) {
      // one dim-bounded aggregate: k×(dim+1) longs cross the wire
      val updated = points
        .withColumn("cell", nearestCell(col("v"), cents))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
      cents = updated.map { r =>
        val n = r.getAs[Long]("n")
        val cv = Array.tabulate(dim) { i =>
          math.floor(r.getAs[Long](s"s$i").toDouble / n).toLong
        }
        r.getAs[Long]("cell") -> cv
      }.sortBy(_._1).toSeq
    }
    points.withColumn("cell", nearestCell(col("v"), cents))
      .select("id", "cell", "v")
  }

  /** Cluster profile after `iters` Lloyd rounds: size and quantized
    * centroid per surviving cell.
    */
  def clusterProfile(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val a = assignments(embeddings, idCol, embCol, k, iters)
    // dim probe on the RAW input, not on `a`: probing `a` ran the whole
    // assignment plan (scan → quantize → argmin kernel) as an extra
    // limit-1 job just to read an array length; quantize is per-component,
    // so the input embedding length IS the assignment vector length
    val dim = embeddings.select(size(col(embCol))).head().getInt(0)
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("v"), i + 1)).as(s"s$i"))
    val meanCols = (0 until dim).map(i =>
      floor(col(s"s$i").cast("double") / col("n_members")).cast("long"))
    a.groupBy("cell")
      .agg(count(lit(1)).as("n_members"), sumCols: _*)
      .select(col("cell"), col("n_members"), array(meanCols: _*).as("centroid"))
      .orderBy("cell")
  }
}
