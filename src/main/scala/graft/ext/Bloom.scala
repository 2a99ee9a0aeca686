package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership for corpus-scale set operations.
  *
  * The 100 TB decontamination problem: remove from the training corpus
  * every document whose content appears in a held-out benchmark set. A
  * plain anti-join shuffles the ENTIRE corpus by fingerprint — the
  * dominant cost at scale, paid even though almost no corpus row matches.
  * A Bloom sketch of the benchmark (mergeable, built in one distributed
  * aggregation; KBs–MBs for millions of entries) inverts that: probing is
  * a map-only scan, and only the tiny "might match" suspect set — true
  * hits plus the sketch's false-positive rate — pays a shuffle for exact
  * verification. Bloom filters have NO false negatives, so rows failing
  * the probe are definitely clean and the two-branch result is EXACT
  * (oracle-checked by q_decontaminate_bloom).
  *
  * Built on Spark's own `BloomFilterAggregate` for the build side and
  * [[graft.functions.BloomProbe]] (same semantics as Spark's
  * `BloomFilterMightContain`, minus its Janino constant-cast quirk) for
  * the probe (not registered for end users; [[graft.GraftExtensions]] exposes them as `bloom_filter_agg`
  * / `might_contain` SQL functions).
  */
object Bloom {

  /** Distributed sketch build as an aggregate column:
    * `bench.agg(bloomAgg(xxhash64(col("text")), items, bits))`. Partial
    * sketches OR-merge map-side, so the build is one scan + one tiny
    * final merge — never a row shuffle. `hashed` must be a LONG column
    * (hash the content with `xxhash64` first).
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Train the sketch to a driver-side model (same "train once, serve
    * many" shape as the IVF coarse quantizer): the returned bytes embed
    * as a literal in any number of later probe queries — the write-time
    * index for repeated incremental-batch decontamination.
    *
    * Returns null when the benchmark contributes NO rows (Spark's
    * BloomFilterAggregate yields null at cardinality 0) — callers must
    * treat a null sketch as "nothing to match" ([[decontaminateExact]]
    * does), never feed it to [[mightContain]], whose probe would be NULL
    * for every row.
    */
  def trainSketch(
      bench: DataFrame,
      contentCol: String,
      expectedItems: Long,
      numBits: Long): Array[Byte] =
    bench
      .agg(bloomAgg(xxhash64(col(contentCol)), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Map-only membership probe against a trained sketch (no false
    * negatives; false positives at the sketch's configured rate).
    */
  def mightContain(sketch: Array[Byte], hashed: Column): Column =
    Bridge.column(graft.functions.BloomProbe(
      Literal(sketch, BinaryType), Bridge.expression(hashed)))

  /** EXACT decontamination via the two-branch plan: rows failing the
    * probe pass through map-only (definitely clean); the suspect set —
    * |true hits| + fpp·|corpus| rows — anti-joins the benchmark
    * fingerprints to kill false positives. The corpus is scanned twice
    * but shuffled ZERO times on the clean branch; at 100 TB a rescan is
    * embarrassingly parallel while the anti-join's full-corpus shuffle is
    * the cluster-wide bottleneck this operator exists to avoid.
    *
    * EXACTNESS CONTRACT: the sketch must have been trained on (a
    * superset of) THIS `bench`'s content — the no-false-negative
    * guarantee is relative to the trained set, so probing with a sketch
    * from an older, smaller benchmark would let new contamination ride
    * the clean branch. For "train once, serve many", pass the benchmark
    * the sketch was trained on; if the benchmark has grown, retrain (or
    * use the sketch-free overload, which trains on the spot). A null
    * sketch (empty benchmark — see [[trainSketch]]) means nothing can
    * match: the corpus passes through unchanged.
    */
  def decontaminateExact(
      corpus: DataFrame,
      contentCol: String,
      bench: DataFrame,
      benchContentCol: String,
      sketch: Array[Byte]): DataFrame = {
    if (sketch == null) return corpus
    val probe = mightContain(sketch, xxhash64(col(contentCol)))
    val benchFp = bench.select(md5(col(benchContentCol)).as("_fp")).distinct()
    val clean = corpus.filter(!probe)
    val suspects = corpus.filter(probe)
      .withColumn("_fp", md5(col(contentCol)))
      .join(benchFp, Seq("_fp"), "left_anti")
      .drop("_fp")
    clean.unionByName(suspects)
  }

  /** Sketch-free convenience form: trains on the passed benchmark, so
    * the sketch/bench coherence of the contract above holds by
    * construction. Sketch sized at 16 bits/item (<1% fpp).
    */
  def decontaminateExact(
      corpus: DataFrame,
      contentCol: String,
      bench: DataFrame,
      benchContentCol: String,
      expectedBenchItems: Long): DataFrame = {
    require(expectedBenchItems > 0, "expectedBenchItems must be positive")
    val sketch = trainSketch(bench, benchContentCol,
      expectedBenchItems, expectedBenchItems * 16)
    decontaminateExact(corpus, contentCol, bench, benchContentCol, sketch)
  }
}
