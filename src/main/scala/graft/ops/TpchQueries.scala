package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** TPC-H completion: the 14 query shapes not yet in the catalog (Q1, Q2,
  * Q4, Q7, Q8, Q9, Q11, Q12, Q13, Q14, Q15, Q16, Q19, Q20), adapted to the
  * driver's synthetic schema (no `partsupp` table — the lineitem
  * (l_partkey, l_suppkey) bridge plays its role; no
  * commitdate/receiptdate/shipmode/container columns — lateness and mode
  * are derived from the columns that exist, deterministically in both
  * engines). Together with q_agg (Q1-lite), q_tpch_q3/q5/q6/q10 and the
  * round-6 subquery family (q17/q18/q21/q22) this makes the full 22-shape
  * TPC-H surface declared and oracle-checked.
  *
  * Plan discipline, applied per query and verified via PlanDump:
  *   - dims (part 2k rows, supplier 100, nation 25, region 5, customer
  *     1.5k at sf0.01 — all fixed-cardinality at any SF) are `broadcast()`;
  *   - anything data-proportional (lineitem, orders, per-part/per-supp
  *     aggregates of them) joins by shuffle on its key, never broadcast,
  *     pinned with `.hint("merge")` where local stats would otherwise
  *     broadcast a fact;
  *   - aggregates use the decimal-cast sum discipline (Catalog scaladoc) so
  *     grouped sums are order-insensitive cross-engine; ratios divide once,
  *     at the end, in double, identically in both engines;
  *   - every oracle ends in a total ORDER BY with a unique tiebreaker.
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** l_extendedprice * (1 - l_discount), decimal-exact. */
  private def discPrice: Column =
    dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount")))

  private val discPriceSql =
    """CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"""

  // ------------------------------------------------------------------ Q1
  private val qTpchQ1 = Q(
    "q_tpch_q1",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(discPrice * (dec(lit(1)) + dec(col("l_tax"))))
            .cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
            .as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                   CAST(CAST(sum($discPriceSql) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                   CAST(CAST(sum($discPriceSql
                            * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
                   CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    "TPC-H Q1: full pricing summary (charge = price*(1-disc)*(1+tax)); one " +
      "map-side-partial hash aggregate over the filtered fact scan")

  // ------------------------------------------------------------------ Q2
  private val qTpchQ2 = Q(
    "q_tpch_q2",
    (s, d) => {
      // Q2 (min-cost supplier) without partsupp: the (part, supplier)
      // bridge and its cost come from lineitem — cost := min decimal unit
      // price observed for the pair. The correlated "cost = min cost over
      // the part" subquery is a same-key window over the bridge aggregate
      // (round-16 rewrite): min(cost) OVER (PARTITION BY l_partkey) + a
      // filter replaces the old per-part re-aggregate + merge self-join,
      // which cost a second full lineitem scan, a third exchange of the
      // bridge, and an SMJ. Result-identical: a bridge row survives iff
      // its cost equals the per-part min — exactly the old join+filter.
      // supplier/nation/region dims stay broadcast.
      val cost = lineitem(s, d)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec(col("l_extendedprice"))).as("cost_d"))
      val wPart = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      val europeSupp = broadcast(
        supplier(s, d)
          .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
      val parts = broadcast(part(s, d)
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_name"))
      cost
        .withColumn("min_cost_d", min(col("cost_d")).over(wPart))
        .filter(col("cost_d") === col("min_cost_d"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(europeSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost_d").cast("double").as("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some("""SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   CAST(cost_d AS DOUBLE) AS cost
            FROM (SELECT l_partkey, l_suppkey,
                         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_d
                  FROM lineitem GROUP BY l_partkey, l_suppkey) ps
            JOIN part ON p_partkey = ps.l_partkey
            JOIN supplier ON s_suppkey = ps.l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
              AND cost_d = (SELECT min(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
                            FROM lineitem l2 WHERE l2.l_partkey = ps.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100"""),
    "TPC-H Q2 shape: correlated min-cost subquery as a same-key window " +
      "over the bridge aggregate (one fact scan, no self-join); " +
      "supplier/nation/region dim chain broadcast")

  // ------------------------------------------------------------------ Q4
  private val qTpchQ4 = Q(
    "q_tpch_q4",
    (s, d) => {
      // Q4 (order priority checking): EXISTS(late lineitem) → left-semi
      // join. No commitdate/receiptdate in this schema: "late" is a ship
      // more than 90 days after the order date, which needs the order row
      // — so the semi join carries the date predicate as an extra join
      // condition (a non-equi conjunct on top of the orderkey equi-key;
      // still a single shuffle on the key).
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val li = lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li.hint("merge"),
          o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-10-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""),
    "TPC-H Q4 shape: EXISTS(late line) as a left-semi join with a non-equi " +
      "lateness conjunct riding the orderkey shuffle")

  // ------------------------------------------------------------------ Q7
  private val qTpchQ7 = Q(
    "q_tpch_q7",
    (s, d) => {
      // Q7 (volume shipping between two trade partners, both directions,
      // by year). The synthetic corpus spreads nation pairs too thin at
      // sf0.001, so the partner grain is the REGION pair (ASIA↔EUROPE) —
      // identical plan shape: two broadcast dim chains on either side of
      // the one real shuffle (lineitem⋈orders on orderkey).
      val suppRegion = broadcast(
        supplier(s, d)
          .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)
            .select(col("r_regionkey"), col("r_name").as("supp_region"))),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "supp_region"))
      val custRegion = broadcast(
        customer(s, d)
          .join(broadcast(nation(s, d)
            .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rk"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(region(s, d)
            .select(col("r_regionkey").as("cr_key"), col("r_name").as("cust_region"))),
            col("cn_rk") === col("cr_key"))
          .select("c_custkey", "cust_region"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(orders(s, d).select("o_orderkey", "o_custkey").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .join(suppRegion, col("l_suppkey") === col("s_suppkey"))
        .join(custRegion, col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
          (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    },
    Some(s"""SELECT supp_region, cust_region, l_year,
                    CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS revenue
             FROM (SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                          CAST(year(l_shipdate) AS BIGINT) AS l_year,
                          $discPriceSql AS volume
                   FROM lineitem
                   JOIN orders ON o_orderkey = l_orderkey
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN customer ON c_custkey = o_custkey
                   JOIN nation n1 ON n1.n_nationkey = s_nationkey
                   JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
                   JOIN nation n2 ON n2.n_nationkey = c_nationkey
                   JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1998-01-01'
                     AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
                       OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))) shipping
             GROUP BY supp_region, cust_region, l_year
             ORDER BY supp_region, cust_region, l_year"""),
    "TPC-H Q7 shape: partner-pair shipping volume by year (region grain); " +
      "dim chains broadcast, single orderkey shuffle for the fact-fact join")

  // ------------------------------------------------------------------ Q8
  private val qTpchQ8 = Q(
    "q_tpch_q8",
    (s, d) => {
      // Q8 (national market share): share = conditional-sum / sum per year
      // — a single aggregate over the joined facts, no second pass.
      val asiaCust = broadcast(
        customer(s, d)
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey"))
      val suppNation = broadcast(
        supplier(s, d)
          .join(broadcast(nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation"))
      val ecoParts = broadcast(
        part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey"))
      lineitem(s, d)
        .join(ecoParts, col("l_partkey") === col("p_partkey"))
        .join(orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey", "o_orderdate").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_3", discPrice)
              .otherwise(dec(lit(0)))).cast("double") /
            sum(discPrice).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(s"""SELECT o_year,
                    CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
             FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                          $discPriceSql AS volume,
                          n1.n_name AS supp_nation
                   FROM lineitem
                   JOIN part ON p_partkey = l_partkey
                   JOIN orders ON o_orderkey = l_orderkey
                   JOIN customer ON c_custkey = o_custkey
                   JOIN nation n2 ON n2.n_nationkey = c_nationkey
                   JOIN region ON r_regionkey = n2.n_regionkey
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN nation n1 ON n1.n_nationkey = s_nationkey
                   WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                     AND o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
             GROUP BY o_year
             ORDER BY o_year"""),
    "TPC-H Q8 shape: market share as conditional-sum/sum in one aggregate; " +
      "region-filtered customer dim and supplier-nation dim broadcast")

  // ------------------------------------------------------------------ Q9
  private val qTpchQ9 = Q(
    "q_tpch_q9",
    (s, d) => {
      // Q9 (product-type profit): no ps_supplycost — the synthetic unit
      // cost is 20% of p_retailprice, decimal-exact so profit sums
      // identically in both engines.
      val greenParts = broadcast(part(s, d)
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice"))
      val suppNation = broadcast(
        supplier(s, d)
          .join(broadcast(nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name"))),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "n_name"))
      val profit =
        discPrice - dec(col("p_retailprice")) * dec(lit(0.2)) * dec(col("l_quantity"))
      lineitem(s, d)
        .join(greenParts, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""SELECT nation, o_year, CAST(CAST(sum(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
             FROM (SELECT n_name AS nation,
                          CAST(year(o_orderdate) AS BIGINT) AS o_year,
                          $discPriceSql
                            - CAST(p_retailprice AS DECIMAL(18,2))
                              * CAST(0.2 AS DECIMAL(18,2))
                              * CAST(l_quantity AS DECIMAL(18,2)) AS amount
                   FROM lineitem
                   JOIN part ON p_partkey = l_partkey
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN orders ON o_orderkey = l_orderkey
                   JOIN nation ON n_nationkey = s_nationkey
                   WHERE p_name LIKE '%gear%') profit
             GROUP BY nation, o_year
             ORDER BY nation, o_year DESC"""),
    "TPC-H Q9 shape: per-nation/year profit with a synthetic decimal unit " +
      "cost (20% of retail price); part and supplier-nation dims broadcast")

  // ----------------------------------------------------------------- Q11
  private val qTpchQ11 = Q(
    "q_tpch_q11",
    (s, d) => {
      // Q11 (important stock): per-part inventory value for one region's
      // suppliers, kept if above a fixed fraction of the region's total —
      // a grouped aggregate HAVING an uncorrelated scalar subquery. The
      // scalar lands as a one-row broadcast join over the reused per-part
      // aggregate (self-referencing plan, aggregated once per branch, both
      // branches map-side partial).
      val n1Supp = broadcast(
        supplier(s, d)
          .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey"))
      val bridged = lineitem(s, d)
        .join(n1Supp, col("l_suppkey") === col("s_suppkey"))
      val perPart = bridged.groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("value_d"))
      val total = bridged.agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("total_d"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_d") > col("total_d") * lit(0.001))
        .select(col("l_partkey").as("ps_partkey"),
          col("value_d").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },
    Some("""SELECT l_partkey AS ps_partkey,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY l_partkey
            HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2)))
                 > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(l_quantity AS DECIMAL(18,2))) * 0.001
                    FROM lineitem
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
                    WHERE r_name = 'EUROPE')
            ORDER BY value DESC, ps_partkey"""),
    "TPC-H Q11 shape: grouped value HAVING > fraction-of-total via a " +
      "one-row broadcast of the uncorrelated scalar aggregate")

  // ----------------------------------------------------------------- Q12
  private val qTpchQ12 = Q(
    "q_tpch_q12",
    (s, d) => {
      // Q12 (shipmode priority): no l_shipmode column — the mode is
      // derived deterministically from l_linenumber (same expression in
      // the oracle). Conditional-count CASE aggregation after the
      // orderkey shuffle join.
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .withColumn("l_shipmode", concat(lit("MODE_"), pmod(col("l_linenumber"), lit(3))))
        .join(orders(s, d).select("o_orderkey", "o_orderpriority").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_shipmode")
    },
    Some("""SELECT l_shipmode,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM (SELECT l_orderkey, 'MODE_' || (l_linenumber % 3) AS l_shipmode
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                    AND l_shipdate < TIMESTAMP '1998-01-01') l
            JOIN orders ON o_orderkey = l_orderkey
            GROUP BY l_shipmode
            ORDER BY l_shipmode"""),
    "TPC-H Q12 shape: CASE-count by derived shipmode after the orderkey " +
      "shuffle join")

  // ----------------------------------------------------------------- Q13
  private val qTpchQ13 = Q(
    "q_tpch_q13",
    (s, d) => {
      // Q13 (customer order-count distribution): left outer join so
      // zero-order customers survive with count 0, then a second, tiny
      // aggregate over the per-customer counts. The priority filter plays
      // the role of the original comment NOT LIKE filter.
      val o = orders(s, d)
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_orderkey", "o_custkey")
      customer(s, d).select("c_custkey")
        .join(o.hint("merge"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer
                  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                                        AND o_orderpriority <> '5-LOW'
                  GROUP BY c_custkey) c_orders
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""),
    "TPC-H Q13: two-level aggregate over a left outer join (zero-order " +
      "customers kept); outer aggregate is count-of-counts, trivially small")

  // ----------------------------------------------------------------- Q14
  private val qTpchQ14 = Q(
    "q_tpch_q14",
    (s, d) => {
      val promoParts = broadcast(part(s, d).select(
        col("p_partkey"), (col("p_type") === "PROMO").as("is_promo")))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(promoParts, col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("is_promo"), discPrice).otherwise(dec(lit(0))))
            .cast("double") * 100.0 /
            sum(discPrice).cast("double")).as("promo_revenue"))
    },
    Some(s"""SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
                    * 100.0
                    / CAST(CAST(sum($discPriceSql) AS VARCHAR) AS DOUBLE) AS promo_revenue
             FROM lineitem JOIN part ON p_partkey = l_partkey
             WHERE l_shipdate >= TIMESTAMP '1997-09-01'
               AND l_shipdate < TIMESTAMP '1997-10-01'"""),
    "TPC-H Q14: promo revenue share; part dim broadcast, single " +
      "conditional-sum aggregate, month filter pushed to the fact scan")

  // ----------------------------------------------------------------- Q15
  private val qTpchQ15 = Q(
    "q_tpch_q15",
    (s, d) => {
      // Q15 (top supplier): revenue-per-supplier aggregate, kept where it
      // equals the global max — the scalar max is a one-row broadcast
      // against the reused aggregate, not a driver collect.
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(discPrice).as("total_revenue_d"))
      val maxRev = rev.agg(max(col("total_revenue_d")).as("max_revenue_d"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("total_revenue_d") === col("max_revenue_d"))
        .join(broadcast(supplier(s, d)), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue_d").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH revenue AS (
               SELECT l_suppkey AS supplier_no,
                      sum($discPriceSql) AS total_revenue_d
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate < TIMESTAMP '1997-04-01'
               GROUP BY l_suppkey)
             SELECT s_suppkey, s_name,
                    CAST(CAST(total_revenue_d AS VARCHAR) AS DOUBLE) AS total_revenue
             FROM supplier JOIN revenue ON s_suppkey = supplier_no
             WHERE total_revenue_d = (SELECT max(total_revenue_d) FROM revenue)
             ORDER BY s_suppkey"""),
    "TPC-H Q15: top-revenue supplier; global max as a one-row broadcast " +
      "join over the reused revenue aggregate")

  // ----------------------------------------------------------------- Q16
  private val qTpchQ16 = Q(
    "q_tpch_q16",
    (s, d) => {
      // Q16 (supplier counts per part config): the bridge comes from
      // lineitem; the "complaints" NOT-IN exclusion becomes a left-anti
      // join against negative-balance suppliers (broadcast — supplier is a
      // dim). countDistinct handles bridge multiplicity.
      val badSupp = broadcast(supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey"))
      val cfgParts = broadcast(part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
      val bridge = lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      bridge
        .join(badSupp, bridge("l_suppkey") === badSupp("s_suppkey"), "left_anti")
        .join(cfgParts, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON p_partkey = ps.l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              AND ps.l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    "TPC-H Q16 shape: distinct part-supplier bridge, NOT IN → broadcast " +
      "left-anti, distinct-count per part config")

  // ----------------------------------------------------------------- Q19
  private val qTpchQ19 = Q(
    "q_tpch_q19",
    (s, d) => {
      // Q19 (discounted revenue): the classic OR-of-ANDs predicate. The
      // join key (l_partkey = p_partkey) is a conjunct of every disjunct,
      // so Catalyst extracts it as the equi-join key and evaluates the
      // residual disjunction post-join; part-side predicates (brand+size)
      // also push into the broadcast side via constraint propagation.
      val p = broadcast(part(s, d).select("p_partkey", "p_brand", "p_size"))
      val li = lineitem(s, d).select("l_partkey", "l_quantity",
        "l_extendedprice", "l_discount")
      li.join(p,
          (col("l_partkey") === col("p_partkey")) && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
        .agg(sum(discPrice).cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n_rows"))
    },
    Some(s"""SELECT CAST(CAST(sum($discPriceSql) AS VARCHAR) AS DOUBLE) AS revenue,
                    CAST(count(*) AS BIGINT) AS n_rows
             FROM lineitem JOIN part ON p_partkey = l_partkey
             WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                    AND l_quantity BETWEEN 1 AND 11)
                OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                    AND l_quantity BETWEEN 10 AND 20)
                OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                    AND l_quantity BETWEEN 20 AND 30)"""),
    "TPC-H Q19: OR-of-ANDs join predicate — equi-key extracted from the " +
      "disjunction, residual evaluated on the broadcast join output")

  // ----------------------------------------------------------------- Q20
  private val qTpchQ20 = Q(
    "q_tpch_q20",
    (s, d) => {
      // Q20 (excess inventory suppliers): nested IN subqueries. Inner
      // layer: per (part, supp) all-time quantity vs 2× the 1997 quantity
      // (availqty > half-of-year analog, conditional sums in one
      // aggregate); parts restricted to SMALL type. Outer: suppliers IN
      // that set, in one nation. Spark side decorrelates by hand:
      // aggregate → filter → distinct supp keys → semi join.
      val smallParts = broadcast(part(s, d)
        .filter(col("p_type") === "SMALL").select("p_partkey"))
      val qty97 = sum(when(year(col("l_shipdate")) === 1997,
        dec(col("l_quantity"))).otherwise(dec(lit(0))))
      val excess = lineitem(s, d)
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("all_qty"), qty97.as("y97_qty"))
        .filter(col("all_qty") > col("y97_qty") * lit(2))
        .select("l_suppkey").distinct()
      supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, s_acctbal
            FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'
              AND s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_type = 'SMALL')
                GROUP BY l_partkey, l_suppkey
                HAVING sum(CAST(l_quantity AS DECIMAL(18,2)))
                     > 2 * sum(CASE WHEN year(l_shipdate) = 1997
                                    THEN CAST(l_quantity AS DECIMAL(18,2))
                                    ELSE CAST(0 AS DECIMAL(18,2)) END))
            ORDER BY s_suppkey"""),
    "TPC-H Q20 shape: nested IN subqueries decorrelated to conditional-sum " +
      "aggregate → distinct keys → left-semi join")

  def all: Seq[Q] = Seq(
    qTpchQ1, qTpchQ2, qTpchQ4, qTpchQ7, qTpchQ8, qTpchQ9, qTpchQ11,
    qTpchQ12, qTpchQ13, qTpchQ14, qTpchQ15, qTpchQ16, qTpchQ19, qTpchQ20)
}
