package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the shapes AQE can't fix alone.
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * helpers cover the remaining patterns — skewed aggregations and
  * broadcast-infeasible skewed joins — with deterministic salting
  * (content-derived, not rand(), so results are reproducible and
  * retry-safe on task re-execution, which rand() salting is not).
  */
object SkewUtils {

  /** Deterministic salt in [0, buckets): hash of the whole row's key
    * columns plus a distinguishing column, stable across retries.
    */
  def salt(distinguishing: Column, buckets: Int): Column =
    pmod(xxhash64(distinguishing), lit(buckets))

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregation over (key, salt) spreads a hot key across `buckets`
    * reducers, the final phase re-aggregates per key. Caller supplies the
    * partial aggs and the matching final (re-)aggs, e.g.
    * partial `sum(x) as s` → final `sum(s) as s`.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      distinguishing: Column,
      buckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", salt(distinguishing, buckets))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed left side against a small-ish right
    * side that still exceeds the broadcast threshold: left rows get a
    * deterministic salt, right rows are replicated once per salt value,
    * and the join key becomes (key, salt) — a hot key spreads over
    * `buckets` tasks at the cost of replicating the right side
    * `buckets`×.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      distinguishing: Column,
      buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", salt(distinguishing, buckets))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
