package graft.ops

import org.apache.spark.sql.SparkSession

/** Cache lifecycle helpers.
  *
  * Several pipelines (MinHash-LSH, tee segments) persist intermediates
  * that feed self-joins or fan-outs; the DataFrames are plan-local, so
  * callers can't unpersist them by reference. In a long-lived session
  * (service, CLI loop, bench harness) release them between units of work
  * so cached blocks don't accumulate until executor storage thrashes.
  */
object CacheUtils {

  /** Unpersist every RDD the context currently tracks (non-blocking). */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
}
