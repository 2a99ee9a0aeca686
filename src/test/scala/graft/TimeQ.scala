package graft

/** Standalone per-query wall-clock probe: times `count()` of the named
  * declared queries at sf0.1, three reps each, on a fresh session —
  * the isolation complement to Bench's all-catalog sweep, for
  * adjudicating whether an in-bench outlier is intrinsic to the query
  * or bench-context weather (GC pressure, host load, JIT state).
  * Usage: sbt "Test/runMain graft.TimeQ q_mp3_roundtrip q_span_index"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      var i = 0
      while (i < 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
        println(f"[timeq] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        ops.CacheUtils.releaseAll(spark)
        i += 1
      }
    }
    spark.stop()
  }
}
