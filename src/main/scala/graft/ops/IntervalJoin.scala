package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join WITHOUT an equi-key — the case Catalyst can
  * only plan as a broadcast-nested-loop join (every probe against every
  * interval), which is quadratic and capped by the broadcastable side.
  *
  * The scale form is BUCKET BINNING: pick a bucket width, floor-divide
  * both sides onto bucket ids (intervals explode to every bucket they
  * overlap), equi-join on the bucket id, then post-filter exact
  * containment. The one shuffle is keyed by bucket — partitionable,
  * AQE-balanceable, and skew follows the time distribution rather than
  * the table sizes. A probe lives in exactly one bucket, so each
  * matching (probe, interval) pair is produced exactly once — no
  * dedup pass.
  *
  * Width tuning: per-interval fan-out is `span/width + 1` exploded rows,
  * per-bucket population is `rate × width`; width ≈ the typical interval
  * span is the standard starting point. The reference has no native
  * joins at all (it would shell out to `join(1)`-style stages,
  * /root/reference/index.js:14-27); this is the Spark-first replacement
  * for that class of stream-pairing work.
  */
object IntervalJoin {

  /** Join `probes` (point column `probeCol`) to `intervals`
    * ([`startCol`, `endCol`] inclusive) on containment. All three
    * columns must be the same numeric domain (e.g. epoch micros).
    * Output: every probe row ⨯ its containing interval rows, with the
    * internal bucket column dropped.
    */
  def containment(
      probes: DataFrame,
      probeCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pb = probes.withColumn("_bkt", floor(col(probeCol) / bucketWidth))
    val iv = intervals.withColumn("_bkt",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    pb.join(iv, "_bkt")
      .filter(col(probeCol).between(col(startCol), col(endCol)))
      .drop("_bkt")
  }
}
