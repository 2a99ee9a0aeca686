package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-run timing of selected queries (variance / steady-state aid).
  * Usage: runMain graft.tools.BenchOne <sfDir> <reps> <queryName>...
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq
                else Seq("q_dedup_clusters")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.05) println(f"[job] id=${j.jobId} $dt%6.2f s")
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val deser = si.taskMetrics.executorDeserializeTime / 1e3
        if (wall > 0.15)
          println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d wall=$wall%6.2f " +
            f"run=$run%6.2f cpu=$cpu%6.2f gc=$gc%5.2f deser=$deser%6.2f ${si.name.take(40)}")
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 until reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep$r $dt%7.2f s")
        graft.ops.CacheUtils.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
