package graft.ext

import graft.SparkSpec

class LoopSessionsSpec extends SparkSpec {

  test("leases: concurrent same-purpose calls get distinct clones") {
    val gate = new java.util.concurrent.CountDownLatch(2)
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.SparkSession]())
    val threads = (0 until 2).map { _ =>
      new Thread(() =>
        LoopSessions.withLoopSession(spark, "spec.lease") { s =>
          seen.add(s)
          gate.countDown()
          gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
          // a data-derived conf set here must not be observable by the
          // other in-flight lease (distinct SessionStates)
          s.conf.set("spark.sql.shuffle.partitions",
            String.valueOf(System.identityHashCode(s) % 7 + 1))
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(seen.size == 2)
    assert(seen.get(0) ne seen.get(1))
    assert(seen.get(0) ne spark)
  }

  test("leases: sequential same-purpose calls reuse one clone") {
    val a = LoopSessions.withLoopSession(spark, "spec.lease.seq")(identity)
    val b = LoopSessions.withLoopSession(spark, "spec.lease.seq")(identity)
    assert(a eq b) // pool size stays at peak concurrency, not call count
  }

  test("forPurpose: one shared clone per constant-conf purpose") {
    val a = LoopSessions.forPurpose(spark, "spec.shared")
    val b = LoopSessions.forPurpose(spark, "spec.shared")
    assert(a eq b)
    assert(a ne spark)
    assert(a ne LoopSessions.forPurpose(spark, "spec.shared2"))
  }
}
