package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 scale-evidence harness: re-measure the contested sf0.1
  * decisions at a scale where operator cost beats the ~0.2 s/query job
  * floor (the round-16 verdict's lead ask). Times DECLARED queries by
  * name under controlled conf overrides in a fresh JVM (sbt forks), plus
  * the experiment-only Q21 rewrite (`x_q21_agg`) so the contested
  * aggregate-vs-semi/anti decision can be re-measured WITHOUT touching
  * the declared query.
  *
  * Usage:
  *   runMain graft.tools.ScaleExperiments <sfDir> <reps> \
  *     [--conf k=v]... [--check] <queryName|x_q21_agg>...
  *
  * Conf overrides of interest (guide §2.3/§3.1):
  *   spark.io.compression.codec=zstd            (shuffle codec experiment)
  *   spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64MB
  *                                              (AQE SMJ→SHJ experiment)
  * State width for the replay queries is overridden via the
  * SPARK_GRAFT_STATE_WIDTH env var (see RelationalQueries.stateWidthFor).
  *
  * Methodology mirrors Bench: one untimed warmup pass per query, then
  * `reps` timed passes; CacheUtils.releaseAll between every run. Prints
  * min (floor) and median per query.
  */
object ScaleExperiments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    var confs = Map.empty[String, String]
    var check = false
    val names = scala.collection.mutable.ArrayBuffer[String]()
    args.drop(2).foldLeft(Option.empty[String]) {
      case (Some("--conf"), kv) =>
        val Array(k, v) = kv.split("=", 2); confs += k -> v; None
      case (None, "--conf") => Some("--conf")
      case (None, "--check") => check = true; None
      case (None, q) => names += q; None
      case (s, _) => s
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // wall clock on a shared host swings with ambient load (measured 2×
    // this round between identical runs minutes apart), so every variant
    // is ALSO graded by executor CPU time + shuffle write bytes — the
    // contention-robust cost of the plan (the SessionTune discipline)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
        shufBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    println(s"[scalex] sfDir=$sfDir cpus=$cpus reps=$reps confs=$confs " +
      s"stateWidthEnv=${sys.env.get("SPARK_GRAFT_STATE_WIDTH")}")

    /** The round-16 Q21 rewrite (per-(order,supplier) max-shipdate
      * aggregate + same-key window stats + join back), reconstructed from
      * OPTIMIZATION_r16.md finding 2 for the sf1 re-measure. Semantics: a
      * row l1 of (order o, supplier s) counts iff o has another supplier
      * (EXISTS) and no other supplier of o shipped strictly later than l1
      * (NOT EXISTS) — i.e. l1.shipdate >= max over other suppliers'
      * max-shipdates. The tool's --check flag proves result equality
      * against the declared q_tpch_q21 before timing is trusted.
      */
    def q21Agg(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val l = s.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val g = l.groupBy("l_orderkey", "l_suppkey")
        .agg(max("l_shipdate").as("ms"))
      val w = Window.partitionBy("l_orderkey")
      val stats = g
        .withColumn("nsupp", count(lit(1)).over(w))
        .withColumn("mx", max(col("ms")).over(w))
        .withColumn("nmx",
          sum(when(col("ms") === col("mx"), 1L).otherwise(0L)).over(w))
        .withColumn("mx2", max(when(col("ms") =!= col("mx"), col("ms"))).over(w))
        .filter(col("nsupp") >= 2)
        .withColumn("mother",
          when(col("ms") === col("mx") && col("nmx") === 1, col("mx2"))
            .otherwise(col("mx")))
        .select("l_orderkey", "l_suppkey", "mother")
      l.join(stats, Seq("l_orderkey", "l_suppkey"))
        .filter(col("l_shipdate") >= col("mother"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).cast("long").as("numwait"))
        .orderBy(desc("numwait"), col("l_suppkey"))
        .limit(50)
    }

    def build(name: String): DataFrame = name match {
      case "x_q21_agg" => q21Agg(spark, sfDir)
      case n => graft.SparkEntry.queries(n)(spark, sfDir)
    }

    if (check) {
      val a = build("x_q21_agg").collect().map(_.toSeq).toSeq
      val b2 = build("q_tpch_q21").collect().map(_.toSeq).toSeq
      println(s"[scalex] q21 equivalence: agg=${a.size} rows, " +
        s"declared=${b2.size} rows, equal=${a == b2}")
      require(a == b2, "x_q21_agg differs from declared q_tpch_q21")
      graft.ops.CacheUtils.releaseAll(spark)
    }

    names.foreach { n =>
      // untimed warmup (Bench methodology: codegen/JIT absorbed)
      build(n).count(); graft.ops.CacheUtils.releaseAll(spark)
      // drain the listener bus so warmup metrics don't leak into rep 0
      Thread.sleep(1500)
      cpuNs.set(0L); shufBytes.set(0L)
      val ts = (0 until reps).map { r =>
        val t0 = System.nanoTime()
        build(n).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.CacheUtils.releaseAll(spark)
        println(f"[scalex] $n rep$r $dt%7.2f s")
        dt
      }
      Thread.sleep(1500) // listener bus drain before reading counters
      val sorted = ts.sorted
      println(f"[scalex] $n%-28s min=${sorted.head}%7.2f s  " +
        f"median=${sorted(sorted.size / 2)}%7.2f s  " +
        f"cpu/rep=${cpuNs.get / 1e9 / reps}%7.2f s  " +
        f"shufMB/rep=${shufBytes.get / 1e6 / reps}%8.1f")
    }
    spark.stop()
  }
}
