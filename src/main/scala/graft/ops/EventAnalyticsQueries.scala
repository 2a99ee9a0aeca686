package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** Event-analytics operators over the `events` stream table: ordered
  * funnels, cohort retention, time-series gap-fill/resampling, and
  * hour-of-day seasonality — the product-analytics surface a
  * clickstream lake serves, each as declarative keyed aggregations (no
  * per-user driver loops, no global sorts outside the oracle ORDER BY).
  */
object EventAnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** Integer microseconds — the cross-engine-stable time axis. */
  private def us(c: org.apache.spark.sql.Column) = unix_micros(c)

  // ---------------------------------------------------------- funnel
  private val qFunnel = Q(
    "q_funnel",
    (s, d) => {
      // Ordered view→click→purchase funnel with a 12 h deadline per
      // stage: the click must follow the user's FIRST view within 12 h,
      // the purchase the qualifying first click. Each stage is one
      // keyed aggregate joined back on user_id — stages co-partition on
      // the same key, so the whole funnel is one shuffle family, and
      // the per-stage deadline is a join conjunct, not a window scan.
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        us(col("ts")).as("t"))
      val dl = 43200000000L // 12 h in µs
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("t")).as("mv"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("t") >= col("mv") && col("t") <= col("mv") + dl)
        .groupBy("user_id").agg(min(col("t")).as("mc"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id")
        .filter(col("t") >= col("mc") && col("t") <= col("mc") + dl)
        .groupBy("user_id").agg(min(col("t")).as("mp"))
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("mv"),
          coalesce(col("mc"), lit(-1L)).as("mc"),
          coalesce(col("mp"), lit(-1L)).as("mp"))
        .orderBy("user_id")
    },
    Some("""WITH v AS (
              SELECT user_id, min(epoch_us(ts)) AS mv
              FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (
              SELECT e.user_id, min(epoch_us(e.ts)) AS mc
              FROM events e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click'
                AND epoch_us(e.ts) >= v.mv
                AND epoch_us(e.ts) <= v.mv + 43200000000
              GROUP BY 1),
            p AS (
              SELECT e.user_id, min(epoch_us(e.ts)) AS mp
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase'
                AND epoch_us(e.ts) >= c.mc
                AND epoch_us(e.ts) <= c.mc + 43200000000
              GROUP BY 1)
            SELECT v.user_id, v.mv,
                   coalesce(c.mc, -1) AS mc,
                   coalesce(p.mp, -1) AS mp
            FROM v
            LEFT OUTER JOIN c ON c.user_id = v.user_id
            LEFT OUTER JOIN p ON p.user_id = v.user_id
            ORDER BY v.user_id"""),
    "ordered view→click→purchase funnel with 12 h per-stage deadlines — " +
      "stage aggregates co-partitioned on user_id, deadlines as join " +
      "conjuncts; per-user stage timestamps (-1 = did not convert)")

  // ------------------------------------------------------- retention
  private val qRetention = Q(
    "q_retention",
    (s, d) => {
      // Cohort retention: cohort = first active day; D+1 / D+7 return
      // rates per cohort. distinct (user, day) activity → per-user
      // cohort → one conditional distinct-count aggregate. All keyed on
      // user_id/cohort — the matrix never materializes user×day.
      val act = events(s, d)
        .select(col("user_id"),
          floor(us(col("ts")).cast("double") / lit(86400000000.0))
            .cast("long").as("day"))
        .distinct()
      val coh = act.groupBy("user_id").agg(min(col("day")).as("cohort"))
      coh.join(act, "user_id")
        .groupBy("cohort")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("day") === col("cohort") + 1, col("user_id")))
            .as("n_d1"),
          countDistinct(when(col("day") === col("cohort") + 7, col("user_id")))
            .as("n_d7"))
        .orderBy("cohort")
    },
    Some("""WITH act AS (
              SELECT DISTINCT user_id,
                     CAST(floor(epoch_us(ts)/86400000000.0) AS BIGINT) AS day
              FROM events),
            coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
            SELECT cohort,
                   count(DISTINCT coh.user_id) AS n_users,
                   count(DISTINCT CASE WHEN a.day = cohort + 1
                                       THEN a.user_id END) AS n_d1,
                   count(DISTINCT CASE WHEN a.day = cohort + 7
                                       THEN a.user_id END) AS n_d7
            FROM coh JOIN act a ON a.user_id = coh.user_id
            GROUP BY cohort ORDER BY cohort"""),
    "cohort retention (first-active-day cohorts, D+1/D+7 return) — " +
      "distinct activity days + one conditional distinct-count aggregate")

  // -------------------------------------------------------- resample
  private val qResample = Q(
    "q_resample",
    (s, d) => {
      // Time-series regularization: per-user hourly resample over each
      // user's own [first, last] hour with forward-fill
      // (last-observation-carried-forward) — the gap-filling step before
      // any window model. The spine is generated per user (sequence +
      // explode: rows ∝ user's span, no global calendar join) and the
      // fill is one ordered window with ignoreNulls last(). Users
      // bounded to a deterministic slice to keep the oracle's spine
      // identical.
      val hourly = events(s, d)
        .filter(col("user_id") < 8)
        .groupBy(col("user_id"),
          floor(us(col("ts")).cast("double") / lit(3600000000.0))
            .cast("long").as("h"))
        .agg(sum(dec(col("value"))).cast("double").as("v"))
      val spine = hourly.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      spine.join(hourly, Seq("user_id", "h"), "left_outer")
        .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(w))
        .withColumn("observed", when(col("v").isNotNull, 1L).otherwise(0L))
        .select("user_id", "h", "v_fill", "observed")
        .orderBy("user_id", "h")
    },
    Some("""WITH hourly AS (
              SELECT user_id,
                     CAST(floor(epoch_us(ts)/3600000000.0) AS BIGINT) AS h,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS v
              FROM events WHERE user_id < 8 GROUP BY 1, 2),
            bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                       FROM hourly GROUP BY 1),
            spine AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h
                      FROM bounds),
            joined AS (SELECT s.user_id, s.h, v
                       FROM spine s LEFT JOIN hourly USING (user_id, h))
            SELECT user_id, h,
                   last_value(v IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS v_fill,
                   CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed
            FROM joined
            ORDER BY user_id, h"""),
    "hourly resample with forward-fill (LOCF): per-user generated spine " +
      "+ one ordered ignoreNulls-last window — time-series gap filling")

  // ----------------------------------------------------- seasonality
  private val qSeasonality = Q(
    "q_seasonality",
    (s, d) =>
      // Hour-of-day seasonal profile per event type: decimal-exact mean
      // per (type, hour) plus each type's share of its daily total —
      // one aggregate + a per-type window rollup bounded by 24 rows.
      events(s, d)
        .groupBy(col("event_type"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).as("sv"))
        .withColumn("share",
          round(col("n").cast("double") /
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy("event_type")), 6))
        .select(col("event_type"), col("hod"), col("n"),
          (col("sv").cast("double") / col("n")).as("avg_value"), col("share"))
        .orderBy("event_type", "hod"),
    Some("""SELECT event_type, hod, n,
                   CAST(CAST(sv AS VARCHAR) AS DOUBLE) / n AS avg_value,
                   round(CAST(n AS DOUBLE) /
                         sum(n) OVER (PARTITION BY event_type), 6) AS share
            FROM (SELECT event_type,
                         CAST(hour(ts) AS BIGINT) AS hod,
                         count(*) AS n,
                         sum(CAST(value AS DECIMAL(18,2))) AS sv
                  FROM events GROUP BY 1, 2)
            ORDER BY event_type, hod"""),
    "hour-of-day seasonality profile per event type: decimal-exact " +
      "means + within-type share (24-row window rollup)")

  // ----------------------------------------------------------- k-core
  private val qKcore = Q(
    "q_kcore",
    (s, d) => {
      // 4-core of the derived interaction graph by 3 fixed peeling
      // rounds — the dense-subgraph extraction that separates hub
      // communities from the long tail (graph-side spam/boilerplate
      // signal). Fixed rounds keep the distributed loop replayable by
      // the unrolled oracle.
      val ev = events(s, d)
      val edges = ev.select(
          (col("user_id") % 64).as("src"),
          (col("event_id") % ((col("user_id") % 64) + 2)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.ext.Graph.kCorePeel(edges, k = 4, rounds = 3).orderBy("node")
    },
    Some("""WITH base AS (
              SELECT DISTINCT (user_id % 64) AS src,
                              (event_id % ((user_id % 64) + 2)) AS dst
              FROM events
              WHERE (user_id % 64) <> (event_id % ((user_id % 64) + 2))),
            e0 AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
            a1 AS (SELECT src AS node FROM e0 GROUP BY src
                   HAVING count(*) >= 4),
            e1 AS (SELECT e.src, e.dst FROM e0 e
                   JOIN a1 x ON e.src = x.node JOIN a1 y ON e.dst = y.node),
            a2 AS (SELECT src AS node FROM e1 GROUP BY src
                   HAVING count(*) >= 4),
            e2 AS (SELECT e.src, e.dst FROM e1 e
                   JOIN a2 x ON e.src = x.node JOIN a2 y ON e.dst = y.node),
            a3 AS (SELECT src AS node FROM e2 GROUP BY src
                   HAVING count(*) >= 4),
            e3 AS (SELECT e.src, e.dst FROM e2 e
                   JOIN a3 x ON e.src = x.node JOIN a3 y ON e.dst = y.node)
            SELECT src AS node, count(*) AS deg FROM e3 GROUP BY src
            ORDER BY node"""),
    "4-core extraction by 3 fixed peeling rounds (degree aggregate + " +
      "two semi joins per round) — hash-equal to the unrolled oracle")

  // ------------------------------------------------------ transitions
  private val qTransitions = Q(
    "q_transitions",
    (s, d) => {
      // First-order Markov transition matrix over each user's event
      // sequence: P(next type | type) from exact pair counts — the
      // sequence-model prior (and anomaly baseline) of an event lake.
      // One per-user ordered window for the successor, then a 5×5-cell
      // aggregate; probabilities from exact integer counts, divided
      // once and rounded (q_fuzzy_join discipline).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("t", "event_id")
      val pairs = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          us(col("ts")).as("t"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTotals = pairs.groupBy("from_type").agg(sum(col("n")).as("nf"))
      pairs.join(broadcast(fromTotals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("nf"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS next_type
              FROM events),
            pairs AS (
              SELECT event_type AS from_type, next_type AS to_type,
                     count(*) AS n
              FROM seq WHERE next_type IS NOT NULL
              GROUP BY 1, 2),
            tot AS (SELECT from_type, sum(n) AS nf FROM pairs GROUP BY 1)
            SELECT from_type, to_type, n,
                   round(CAST(n AS DOUBLE) / nf, 6) AS p
            FROM pairs JOIN tot USING (from_type)
            ORDER BY from_type, to_type"""),
    "first-order Markov transition matrix over per-user event sequences " +
      "— exact pair counts, one ordered window + type-pair aggregate")

  // ------------------------------------------------- negative sampling
  private val qNegativeEdges = Q(
    "q_negative_edges",
    (s, d) => {
      // Link-prediction training pairs: every real edge labeled 1, plus
      // per-source deterministic negative candidates (hash-proposed
      // destinations) that survive an anti-join against the edge set,
      // labeled 0. Content-addressed proposals (no RNG state) make the
      // sample reproducible and oracle-replayable; the anti-join is the
      // standard "proposed non-edge might actually exist" correction,
      // done as ONE keyed join rather than per-sample lookups.
      val ev = events(s, d)
      val edges = ev.select(
          (col("user_id") % 64).as("src"),
          (col("event_id") % ((col("user_id") % 64) + 2)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
      val nNodes = lit(65L) // id space of this construction: [0, 65)
      val proposals = nodes
        .select(col("node").as("src"),
          explode(sequence(lit(1), lit(5))).as("j"))
        .select(col("src"),
          pmod(hash(col("src"), col("j")), nNodes).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val negatives = proposals
        .join(edges, Seq("src", "dst"), "left_anti")
        .select(col("src"), col("dst"), lit(0L).as("label"))
      edges.select(col("src"), col("dst"), lit(1L).as("label"))
        .unionByName(negatives)
        .orderBy("src", "dst", "label")
    },
    None, // Spark's hash() (Murmur3 with Spark's seeding) is
    // engine-specific — the PROPOSAL stream can't be replayed in DuckDB.
    // Anchored by EventAnalyticsSpec AND the driver-checked
    // q_negative_edges_anchor (the label/edge-set invariants, which are
    // oracle-expressible even though the proposal stream is not).
    "link-prediction training pairs: positives + hash-proposed negative " +
      "candidates corrected by one anti-join — deterministic negative " +
      "sampling with no RNG state")

  private val qNegativeEdgesAnchor = Q(
    "q_negative_edges_anchor",
    (s, d) => {
      // Driver-visible certificate for q_negative_edges: the proposal
      // hashes are engine-specific, but the output's CONTRACT is not —
      // (a) the positives are exactly the edge set, (b) no emitted
      // negative is a real edge, (c) nothing is a self-loop. DuckDB
      // derives the edge set independently, so n_pos is a hash-checked
      // exact count and the three violation counters must be zero. A bug
      // in the anti-join, the labeling, or the self-loop filter breaks
      // this row even though the sampled negatives themselves can't be
      // replayed cross-engine.
      val ev = events(s, d)
      val edges = ev.select(
          (col("user_id") % 64).as("src"),
          (col("event_id") % ((col("user_id") % 64) + 2)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val out = qNegativeEdges.fn(s, d)
      out.join(edges.withColumn("is_edge", lit(1L)), Seq("src", "dst"), "left")
        .agg(
          sum(when(col("label") === 1, 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("label") === 1 && col("is_edge").isNull, 1L)
            .otherwise(0L)).as("n_pos_nonedge"),
          sum(when(col("label") === 0 && col("is_edge").isNotNull, 1L)
            .otherwise(0L)).as("n_neg_real_edge"),
          sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("n_self"))
    },
    Some("""WITH edges AS (
              SELECT DISTINCT (user_id % 64) AS src,
                              (event_id % ((user_id % 64) + 2)) AS dst
              FROM events
              WHERE (user_id % 64) <> (event_id % ((user_id % 64) + 2)))
            SELECT CAST(count(*) AS BIGINT) AS n_pos,
                   CAST(0 AS BIGINT) AS n_pos_nonedge,
                   CAST(0 AS BIGINT) AS n_neg_real_edge,
                   CAST(0 AS BIGINT) AS n_self
            FROM edges"""),
    "negative-sampling contract anchor: positives ≡ edge set (exact " +
      "count), zero negatives that are real edges, zero self-loops — " +
      "the oracle-expressible invariants of q_negative_edges")

  // ------------------------------------------------- skew diagnostics
  private val qSkewReport = Q(
    "q_skew_report",
    (s, d) => {
      // The "should I salt this join key" probe, as a first-class query:
      // per-key frequency distribution stats for a join column — top-1
      // share, exact p50/p90/p99 of per-key counts, and the hot-key count
      // above 10× the median. Two aggregates (key counts → distribution
      // stats), both map-side combined; this is what SkewUtils' sampled
      // detection decides from, exposed exactly.
      val counts = events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      // Float discipline: the interpolated percentiles are quantized to
      // ppm longs (exact below 2^53) and top-1 share is stated in exact
      // integer ppm — no double cell ever reaches the comparator.
      counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("n")).as("n_rows"),
          max(col("n")).as("max_n"),
          percentile(col("n"), lit(0.5)).as("p50d"),
          percentile(col("n"), lit(0.9)).as("p90d"),
          percentile(col("n"), lit(0.99)).as("p99d"))
        .select(col("n_keys"), col("n_rows"), col("max_n"),
          floor(col("p50d") * lit(1000000L)).cast("long").as("p50_ppm"),
          floor(col("p90d") * lit(1000000L)).cast("long").as("p90_ppm"),
          floor(col("p99d") * lit(1000000L)).cast("long").as("p99_ppm"),
          expr("CAST((max_n * 1000000) DIV n_rows AS BIGINT)")
            .as("top1_share_ppm"))
    },
    Some("""WITH counts AS (
              SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
            SELECT count(*) AS n_keys,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   max(n) AS max_n,
                   CAST(floor(quantile_cont(n, 0.5) * 1000000) AS BIGINT) AS p50_ppm,
                   CAST(floor(quantile_cont(n, 0.9) * 1000000) AS BIGINT) AS p90_ppm,
                   CAST(floor(quantile_cont(n, 0.99) * 1000000) AS BIGINT) AS p99_ppm,
                   CAST((max(n) * 1000000) // sum(n) AS BIGINT) AS top1_share_ppm
            FROM counts"""),
    "join-key skew report: per-key count distribution (top-1 share, " +
      "exact percentiles) — the operational 'salt or not' probe behind " +
      "SkewUtils, as a declared query")

  // ----------------------------------------------- GROUP BY ALL parity
  private val qGroupByAll = Q(
    "q_group_by_all",
    (s, d) => {
      // GROUP BY ALL / ORDER BY ALL (the modern analyst dialect both
      // engines now speak): grouping keys inferred from the
      // non-aggregate select list. The SQL text passed to spark.sql IS
      // the oracle string — dialect-level parity like q_recursive_cte.
      events(s, d).createOrReplaceTempView("events_gba")
      s.sql("""SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                      count(*) AS n
               FROM events_gba
               GROUP BY ALL ORDER BY ALL""")
    },
    Some("""SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                   count(*) AS n
            FROM events
            GROUP BY ALL ORDER BY ALL"""),
    "GROUP BY ALL / ORDER BY ALL dialect parity — grouping keys " +
      "inferred from the select list; identical SQL text in both engines")

  def all: Seq[Q] = Seq(qFunnel, qRetention, qResample, qSeasonality,
    qKcore, qTransitions, qNegativeEdges, qNegativeEdgesAnchor,
    qSkewReport, qGroupByAll)
}
