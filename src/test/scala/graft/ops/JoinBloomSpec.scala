package graft.ops

import graft.{SparkEntry, SparkSpec}

class JoinBloomSpec extends SparkSpec {

  test("runtime bloom filter is injected into the fact scan and join stays sort-merge") {
    val df = SparkEntry.queries("q_join_bloom")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected an injected bloom probe (might_contain) in:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      "fact join must stay sort-merge (never broadcast the fact side)")
    assert(!plan.contains("BroadcastHashJoin Inner"),
      "the equi-join itself must not degrade to a fact broadcast")
  }

  test("cloned-session conf does not leak into the caller's session") {
    SparkEntry.queries("q_join_bloom")(spark, sfDir).count()
    assert(spark.conf
      .getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .forall(_ != "0"),
      "q_join_bloom must tune thresholds on its OWN session only")
  }
}
