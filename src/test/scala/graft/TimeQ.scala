package graft

/** Standalone per-query wall-clock probe: times `count()` of the named
  * declared queries at sf0.1, three reps each, on a fresh session —
  * the isolation complement to Bench's all-catalog sweep, for
  * adjudicating whether an in-bench outlier is intrinsic to the query
  * or bench-context weather (GC pressure, host load, JIT state).
  *
  * Usage: sbt "Test/runMain graft.TimeQ q_mp3_roundtrip q_span_index"
  *        sbt "Test/runMain graft.TimeQ --json=TIMEQ_r16.json"
  *
  * With `--json=PATH` the per-rep seconds are ALSO archived as a JSON
  * artifact (the round-15 verdict's ask: per-round floor files so
  * bench-weather adjudication can diff committed artifacts instead of
  * re-running yesterday's tree on today's box). With no query names,
  * the standing watch set below is probed — the queries whose bench
  * numbers have historically needed adjudication plus the round's
  * newest cost-bearing entries.
  */
object TimeQ {

  /** Default probe set: historical watch items + current top-cost.
    * Round 17 adds the two-round 0.94–0.96× hoverers (q_hamming_absorb /
    * q_hamming_index — VERDICT r16 item 10: two rounds running earns a
    * TimeQ floor entry) and this round's touched paths (q_lm_score,
    * q_web_curate_engine).
    */
  private val WatchSet = Seq(
    "q_span_index", "q_7z_extract", "q_classifier_train", "q_zip_methods",
    "q_mp3_roundtrip", "q_webp_lossy_roundtrip", "q_recursive_cte",
    "q_dedup_audio_incremental", "q_kmeans",
    "q_dedup_image_anchor", "q_dedup_image_orient_anchor",
    "q_tiff_ccitt", "q_video_thumb_anchor",
    "q_hamming_absorb", "q_hamming_index",
    "q_lm_score", "q_web_curate_engine")

  def main(args: Array[String]): Unit = {
    val jsonPath = args.collectFirst {
      case a if a.startsWith("--json=") => a.stripPrefix("--json=")
    }
    val names = args.filterNot(_.startsWith("--")) match {
      case e if e.isEmpty => WatchSet
      case e => e.toSeq
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (name <- names) {
      val rs = (0 until 3).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[timeq] $name rep$i $s%.2f s")
        ops.CacheUtils.releaseAll(spark)
        s
      }
      reps(name) = rs
    }
    jsonPath.foreach { p =>
      val qs = reps.map { case (n, rs) =>
        s""""$n":[${rs.map(r => f"$r%.2f").mkString(",")}]"""
      }.mkString(",")
      val doc = s"""{"sf":"0.1","reps":3,"queries":{$qs}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), doc + "\n")
      println(s"[timeq] wrote $p")
    }
    spark.stop()
  }
}
