package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), 100.0),
    (1L, ts("2024-01-01 10:00:20"), 101.0),
    (2L, ts("2024-01-01 10:00:10"), 200.0),
    (3L, ts("2024-01-01 10:00:10"), 300.0) // key with no quotes
  ).toDF("sym", "trade_ts", "trade_px")

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 99.5),
    (1L, ts("2024-01-01 10:00:10"), 100.5),
    (1L, ts("2024-01-01 10:00:30"), 102.0), // after all trades
    (2L, ts("2024-01-01 10:00:10"), 199.5)  // exactly at trade ts
  ).toDF("sym", "quote_ts", "bid")

  test("each left row gets the latest right row at or before its timestamp") {
    val out = AsOfJoin.asof(trades, quotes, "sym", "trade_ts", "quote_ts", Seq("bid"))
      .orderBy("sym", "trade_ts")
      .collect()
    val byKey = out.map(r => (r.getLong(0), r.getTimestamp(1)) ->
      Option(r.getAs[java.lang.Double]("asof_bid")).map(_.doubleValue)).toMap
    assert(byKey((1L, ts("2024-01-01 10:00:05"))).contains(99.5))
    assert(byKey((1L, ts("2024-01-01 10:00:20"))).contains(100.5))
    assert(byKey((2L, ts("2024-01-01 10:00:10"))).contains(199.5)) // ts tie: quote visible
    assert(byKey((3L, ts("2024-01-01 10:00:10"))).isEmpty)         // no quotes → null
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asof(trades, quotes, "sym", "trade_ts", "quote_ts",
        Seq("bid"), tolerance = Some(lit(5L))) // ≤5 seconds staleness
      .orderBy("sym", "trade_ts")
      .collect()
    val byKey = out.map(r => (r.getLong(0), r.getTimestamp(1)) ->
      Option(r.getAs[java.lang.Double]("asof_bid")).map(_.doubleValue)).toMap
    assert(byKey((1L, ts("2024-01-01 10:00:05"))).contains(99.5))  // 5s old: kept
    assert(byKey((1L, ts("2024-01-01 10:00:20"))).isEmpty)         // 10s old: dropped
    assert(byKey((2L, ts("2024-01-01 10:00:10"))).contains(199.5)) // 0s old
  }

  test("all asof_* fields come from the SAME right row even when a value column is null") {
    // latest quote has a NULL bid: a per-column carry would fall back to
    // the older row's bid while asof_ts reported the newer timestamp —
    // the struct carry must surface the newer row's (null bid, its ts)
    val quotesWithNull = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(99.5)),
      (1L, ts("2024-01-01 10:00:10"), None: Option[Double])
    ).toDF("sym", "quote_ts", "bid")
    val trade = Seq((1L, ts("2024-01-01 10:00:20"), 101.0))
      .toDF("sym", "trade_ts", "trade_px")
    val out = AsOfJoin.asof(trade, quotesWithNull, "sym", "trade_ts", "quote_ts", Seq("bid"))
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_bid")))
    assert(out.head.getTimestamp(out.head.fieldIndex("asof_ts")) == ts("2024-01-01 10:00:10"))
  }

  test("one shuffle on the key: plan has a single exchange before the window") {
    val out = AsOfJoin.asof(trades, quotes, "sym", "trade_ts", "quote_ts", Seq("bid"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most one keyed shuffle:\n$plan")
  }
}
