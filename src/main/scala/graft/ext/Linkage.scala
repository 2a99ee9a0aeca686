package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerKernel.jaro_winkler

/** Record linkage: blocked fuzzy joins.
  *
  * The 100 TB shape for entity resolution: never all-pairs. A cheap
  * deterministic BLOCKING key (suffix/prefix/phonetic/sorted-qgram) bounds
  * the candidate set to same-block pairs — one equi-join shuffle on the
  * block key, exactly like every dedup path in [[Dedup]] — and only
  * candidates pay the O(|a|·window) scoring kernel
  * ([[graft.functions.JaroWinklerKernel]], codegen'd, runs inside the
  * join's generated loop). Top-1-per-probe selection is a rank-1 window,
  * which Spark executes as WindowGroupLimit: the per-probe best survives
  * the partial stage, so the full candidate set is never collected
  * anywhere.
  *
  * The reference can only reach fuzzy matching by piping records through
  * an external stage (`/root/reference/index.js:14-27`); here it is a
  * declarative plan Catalyst can push filters into.
  */
object Linkage {

  /** Fuzzy-join `probe` against `reference`: candidates share `blockKey`,
    * are scored with Jaro-Winkler on (`probeText`, `refText`), kept at
    * `score >= threshold`, and reduced to the best match per probe row
    * (highest score, ties broken by reference id for determinism).
    *
    * Scores are rounded to 6 decimals BEFORE ranking so that ordering is
    * stable across engines/architectures — a last-ulp difference must
    * never decide a match.
    *
    * Output: (probe id, match id, score, ncand) — `ncand` is the number of
    * surviving candidates for the probe row, a per-row audit of blocking
    * selectivity (at scale, a blocking key whose ncand explodes is the
    * skew signal to fix).
    */
  def fuzzyJoin(
      probe: DataFrame,
      reference: DataFrame,
      probeId: String,
      probeText: String,
      refId: String,
      refText: String,
      blockKey: Column => Column,
      threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    val p = probe.select(col(probeId).as("probe_id"), col(probeText).as("_ptext"),
      blockKey(col(probeText)).as("_block"))
    val r = reference.select(col(refId).as("match_id"), col(refText).as("_rtext"),
      blockKey(col(refText)).as("_block"))
    val scored = p.join(r, "_block")
      .withColumn("score", round(jaro_winkler(col("_ptext"), col("_rtext")), 6))
      .filter(col("score") >= threshold)
    val w = Window.partitionBy("probe_id")
    scored
      .withColumn("ncand", count(lit(1)).over(w))
      .withColumn("_rn", row_number().over(w.orderBy(col("score").desc, col("match_id"))))
      .filter(col("_rn") === 1)
      .select(col("probe_id"), col("match_id"), col("score"), col("ncand").cast("long"))
  }
}
