package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hashed-feature linear quality classifier — the fastText-shaped "train a
  * cheap model ON the corpus, then gate the corpus WITH it" curation step
  * (Joulin et al. 2016's linear classifier over hashed bag-of-words;
  * the quality-filter role described for e.g. CCNet/GPT-3-style pipelines).
  *
  * Scale shape:
  *   - featurization is one explode + two keyed aggregations producing ONE
  *     compact row per document (`array<struct<i,x>>` of its nonzero
  *     hashed-feature weights) — persisted once, reused every iteration;
  *   - each training iteration is a map-only scoring pass over that table
  *     plus ONE keyed shuffle bounded by `dim` reducer keys (the gradient
  *     histogram), then a driver-side weight update on a `dim`-sized
  *     vector — the Bpe.scala shape: the corpus-sized computation is an
  *     aggregation, the model loop runs on the compact artifact;
  *   - gradient terms are aggregated as DECIMAL(28,12), so training is
  *     bit-deterministic regardless of partitioning (the lmScore
  *     order-insensitive-sum discipline applied to learning);
  *   - scoring/gating is a pure column expression over builtins
  *     (`transform`/`element_at`/`aggregate` with the weight vector as one
  *     literal plan object) — codegen'd, map-only, runs at scan speed.
  *
  * The intercept rides as a constant feature at index `dim` (weights array
  * length dim+1), so one gradient histogram covers weights AND bias.
  */
object Classifier {

  /** Trained model artifact: `weights(dim)` is the intercept. */
  final case class Model(weights: Array[Double], dim: Int) {
    require(weights.length == dim + 1, s"weights must be dim+1 (${dim + 1})")
    def bias: Double = weights(dim)
  }

  /** Production feature hash: xxhash64 bucket in [0, dim). */
  def hashIndex(tok: Column, dim: Int): Column =
    pmod(xxhash64(tok), lit(dim.toLong)).cast("int")

  /** Engine-portable feature hash in [0, 256): two md5 hex nibbles.
    * `instr`/`strpos` replay identically in DuckDB, which makes the whole
    * scoring kernel oracle-checkable cross-engine.
    */
  def md5Index(tok: Column): Column =
    ((instr(lit("0123456789abcdef"), substring(md5(tok), 1, 1)) - 1) * 16 +
      (instr(lit("0123456789abcdef"), substring(md5(tok), 2, 1)) - 1)).cast("int")

  private def toks(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Mean-of-hashed-weights logit + sigmoid, as one map-only expression.
    * `indexOf` picks the hash family (md5Index for the portable kernel,
    * hashIndex(_, dim) for production).
    */
  def scoreExpr(text: Column, model: Model, indexOf: Column => Column): Column = {
    val w = typedlit(model.weights.toSeq)
    val t = toks(text)
    val z = lit(model.bias) +
      aggregate(
        transform(t, tok => element_at(w, indexOf(tok) + 1)),
        lit(0.0), (acc, x) => acc + x) / size(t)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Score a corpus: (id, n_toks, score). Rows with no tokens are dropped
    * (a mean over zero features has no defined logit).
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      indexOf: Column => Column): DataFrame =
    df.filter(size(toks(col(textCol))) > 0)
      .select(col(idCol),
        size(toks(col(textCol))).cast("long").as("n_toks"),
        scoreExpr(col(textCol), model, indexOf).as("score"))

  /** One compact feature row per document:
    * (_id, _y, _f: array<struct<i:int, x:double>>) where x = count/n_toks
    * and the intercept feature (i=dim, x=1) is appended. Built with one
    * explode + two keyed aggregations; the caller persists it across
    * iterations.
    */
  private[ext] def featurize(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      indexOf: Column => Column): DataFrame =
    df.select(col(idCol).as("_id"), col(labelCol).cast("double").as("_y"),
        toks(col(textCol)).as("_t"))
      .filter(size(col("_t")) > 0)
      .select(col("_id"), col("_y"), size(col("_t")).as("_n"),
        explode(transform(col("_t"), indexOf)).as("_i"))
      .groupBy("_id", "_y", "_n", "_i")
      .agg(count(lit(1)).as("_c"))
      .groupBy("_id", "_y")
      .agg(collect_list(
        struct(col("_i").cast("int").as("i"),
          (col("_c").cast("double") / col("_n")).as("x"))).as("_f"))
      .select(col("_id"), col("_y"),
        concat(col("_f"),
          array(struct(lit(dim).cast("int").as("i"), lit(1.0).as("x")))).as("_f"))

  /** Full-batch logistic regression over hashed features, optimized with
    * Adagrad (per-coordinate adaptive steps): mean-normalized bag-of-words
    * gradients span orders of magnitude across buckets, so a fixed global
    * step either diverges on hot buckets or never moves cold ones —
    * adaptive scaling is what makes tens (not thousands) of full-batch
    * passes sufficient. The accumulator lives driver-side next to the
    * weights (dim+1 doubles), so the distributed work per step stays one
    * map-only scoring pass + one dim-bounded gradient histogram.
    *
    * @param labelCol 0/1 (castable to double) target column
    * @param dim      hashed feature dimension (weight vector is dim+1)
    * @param iters    full-batch gradient steps
    * @param lr       Adagrad base step (first update per touched
    *                 coordinate is ±lr; total movement is O(lr·iters))
    */
  def train(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int = 1 << 12,
      iters: Int = 20,
      lr: Double = 1.0,
      indexOf: Column => Column = null): Model = {
    val idx = Option(indexOf).getOrElse(hashIndex(_: Column, dim))
    val feats = featurize(df, idCol, textCol, labelCol, dim, idx)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = feats.count().toDouble // materializes the persist
    require(nDocs > 0, "no non-empty documents to train on")
    val w = Array.fill(dim + 1)(0.0)
    val gsq = Array.fill(dim + 1)(0.0)
    try {
      (0 until iters).foreach { _ =>
        // codegen sparse-dot kernel (same left-to-right double sum as the
        // aggregate() HOF it replaces — bit-identical model, ~interpreter
        // wall removed; weights ride as a plan reference object)
        val z = graft.functions.SparseDot.sparse_dot_w(col("_f"), w.clone())
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        // gradient histogram: dim+1 reducer keys, DECIMAL-exact so the
        // result (and therefore the trained model) is partitioning-stable
        val grad = feats
          .select(((p - col("_y"))).as("_r"), explode(col("_f")).as("f"))
          .select(col("f.i").as("i"),
            (col("_r") * col("f.x")).cast(DecimalType(28, 12)).as("g"))
          .groupBy("i").agg(sum("g").as("g"))
          .collect()
        grad.foreach { row =>
          val i = row.getInt(0)
          val g = row.getDecimal(1).doubleValue() / nDocs
          gsq(i) += g * g
          if (gsq(i) > 0.0) w(i) -= lr * g / math.sqrt(gsq(i))
        }
      }
    } finally feats.unpersist()
    Model(w, dim)
  }
}
