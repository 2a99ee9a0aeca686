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
  * Scale shape (vs the toy all-pairs k-means): centroids are a k-row
  * broadcast, assignment is map-only + a min-struct aggregate (partial
  * map-side combine — no per-key window sort), the update is a two-level
  * keyed aggregate on (cell, pos). No driver data path; the per-round state
  * is the k×dim centroid table, never the points.
  */
object Cluster {

  /** Component-wise quantization to integer micro-units. `floor`, not
    * cast-truncation: Spark's double→long cast truncates toward zero while
    * SQL CAST in DuckDB rounds — floor is the one portable choice.
    */
  def quantize(embCol: Column): Column =
    transform(embCol, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Exact squared L2 between two quantized vectors (fixed component-order
    * fold; every term an exact-in-double integer).
    */
  def sqDistQ(v: Column, c: Column): Column =
    aggregate(
      zip_with(v, c, (x, y) => (x - y).cast("double") * (x - y).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** `iters` full Lloyd rounds from the deterministic seed (the k lowest
    * `idCol` vectors), returning the final per-point assignment
    * `(id, cell, v)`. Ties in distance break toward the lowest cell id. A
    * cell that loses all members drops out (deterministically — the oracle
    * mirrors the same rule).
    */
  def assignments(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val points = embeddings.select(
      col(idCol).cast("long").as("id"), quantize(col(embCol)).as("v"))
    var cents = points.filter(col("id") < k)
      .select(col("id").as("cell"), col("v").as("cv"))
    def assign(c: DataFrame): DataFrame =
      points.crossJoin(broadcast(c))
        .select(col("id"),
          struct(sqDistQ(col("v"), col("cv")).as("dist"), col("cell"),
            col("v")).as("sc"))
        // min-struct = top-1 per point with map-side partial aggregation;
        // a row_number window would sort k rows per point post-shuffle
        .groupBy("id").agg(min(col("sc")).as("sc"))
        .select(col("id"), col("sc.cell").as("cell"), col("sc.v").as("v"))
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = a
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        // floor(sum/count) with the sum exact in double (|x|≤2e6-scale,
        // count bounded by the corpus — far below 2^53 at any tested SF;
        // at true 100 TB scale the quantization scale is the tunable)
        .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("s"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          st => st("s")).as("cv"))
    }
    assign(cents)
  }

  /** Cluster profile after `iters` Lloyd rounds: size and quantized
    * centroid per surviving cell.
    */
  def clusterProfile(
      embeddings: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int): DataFrame =
    assignments(embeddings, idCol, embCol, k, iters)
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n"),
        floor(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("s"))
      .groupBy("cell")
      .agg(max(col("n")).cast("long").as("n_members"),
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          st => st("s")).as("centroid"))
      .orderBy("cell")
}
