package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ext.{Cluster, Graph}
import Tables._

/** Round-7 additions beyond the TPC-H completion: oracle-certified
  * distributed clustering (quantized Lloyd's k-means), frontier BFS
  * shortest paths, SCD-2 temporal dimension construction, a k-anonymity
  * curation audit, and a stream-static broadcast enrichment through the
  * bounded-replay harness.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  // -------------------------------------------------------------- k-means
  /** DuckDB replay of [[Cluster.assignments]]: `iters` unrolled Lloyd
    * rounds in the same quantized integer arithmetic (1-based list indexing
    * vs Spark's 0-based posexplode changes nothing — both emit centroids in
    * component order).
    */
  private def kmeansOracleSql(k: Int, iters: Int, dim: Int): String = {
    def assignFrom(cents: String): String =
      s"""SELECT id, v, cell FROM (
         |    SELECT q.id, q.v, c.cell,
         |           row_number() OVER (PARTITION BY q.id ORDER BY
         |             list_sum(list_transform(range(1, len(q.v)+1),
         |               j -> CAST(q.v[j]-c.cv[j] AS DOUBLE)*(q.v[j]-c.cv[j]))),
         |             c.cell) AS rn
         |    FROM q CROSS JOIN $cents c)
         |  WHERE rn = 1""".stripMargin
    val head =
      s"""WITH q AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
         |  FROM embeddings),
         |pos AS (SELECT unnest(range(1, ${dim + 1})) AS pos),
         |c0 AS (SELECT id AS cell, v AS cv FROM q WHERE id < $k)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |a$i AS (
         |  ${assignFrom(s"c${i - 1}")}),
         |c$i AS (
         |  SELECT cell, list(s ORDER BY pos) AS cv FROM (
         |    SELECT cell, pos,
         |           CAST(floor(CAST(sum(v[pos]) AS DOUBLE)/count(*)) AS BIGINT) AS s
         |    FROM a$i CROSS JOIN pos GROUP BY cell, pos)
         |  GROUP BY cell)""".stripMargin
    }.mkString
    s"""$head$rounds,
       |afin AS (
       |  ${assignFrom(s"c$iters")})
       |SELECT cell, n_members, centroid FROM (
       |  SELECT cell, max(n) AS n_members, list(s ORDER BY pos) AS centroid FROM (
       |    SELECT cell, pos, CAST(count(*) AS BIGINT) AS n,
       |           CAST(floor(CAST(sum(v[pos]) AS DOUBLE)/count(*)) AS BIGINT) AS s
       |    FROM afin CROSS JOIN pos GROUP BY cell, pos)
       |  GROUP BY cell)
       |ORDER BY cell""".stripMargin
  }

  private val qKmeans = Q(
    "q_kmeans",
    (s, d) =>
      Cluster.clusterProfile(embeddings(s, d), "vec_id", "embedding",
        k = 8, iters = 2),
    Some(kmeansOracleSql(k = 8, iters = 2, dim = 64)),
    "Lloyd's k-means (2 full rounds, deterministic lowest-id seeds) in " +
      "quantized integer space — the distributed broadcast-assign/keyed-" +
      "update loop is hash-identical to DuckDB's unrolled replay")

  // ------------------------------------------------------- shortest paths
  private val qShortestPath = Q(
    "q_shortest_path",
    (s, d) => {
      // Same derived hub-skewed graph as q_pagerank; source 50 has the
      // widest fan-out (dst ∈ [0, 52)), so the BFS exercises real
      // multi-hop frontiers instead of a chain.
      val ev = events(s, d)
      val edges = ev.select(
          (col("user_id") % 64).as("src"),
          (col("event_id") % ((col("user_id") % 64) + 2)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      Graph.shortestPaths(edges, source = 50L, maxHops = 6).orderBy("node")
    },
    Some("""WITH RECURSIVE edges AS (
              SELECT DISTINCT (user_id % 64) AS src,
                              (event_id % ((user_id % 64) + 2)) AS dst
              FROM events
              WHERE (user_id % 64) <> (event_id % ((user_id % 64) + 2))),
            walk(node, dist) AS (
              SELECT CAST(50 AS BIGINT), CAST(0 AS BIGINT)
              UNION
              SELECT e.dst, w.dist + 1
              FROM walk w JOIN edges e ON e.src = w.node
              WHERE w.dist < 6)
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
            ORDER BY node"""),
    "single-source BFS shortest paths (frontier joins + anti-join settled " +
      "set) — hash-equal to a bounded recursive-CTE oracle")

  // ----------------------------------------------------------------- SCD2
  private val qScd2 = Q(
    "q_scd2",
    (s, d) => {
      // Slowly-changing-dimension type-2 construction from an event log:
      // per user, consecutive runs of the same event_type collapse to one
      // validity interval [valid_from_us, valid_to_us) with the current
      // row open-ended. This is the CDC→dimension-table shape (MERGE
      // without a mutable store: intervals derived declaratively). All
      // windows share one (user_id × time) sort — Catalyst plans a single
      // shuffle+sort reused by lag, cumsum, and lead.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      val seg = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("seg", sum(col("chg")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      val iv = seg.groupBy("user_id", "seg")
        .agg(min(col("event_type")).as("event_type"),
          min(col("us")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("seg")
      iv.withColumn("valid_to_us",
          coalesce(lead(col("valid_from_us"), 1).over(w2), lit(-1L)))
        .withColumn("is_current",
          when(col("valid_to_us") === -1L, 1L).otherwise(0L))
        .select("user_id", "event_type", "valid_from_us", "valid_to_us",
          "is_current", "n_events")
        .orderBy("user_id", "valid_from_us")
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
            seg AS (
              SELECT user_id, event_type, us,
                     sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS seg
              FROM marked),
            iv AS (
              SELECT user_id, seg, min(event_type) AS event_type,
                     min(us) AS valid_from_us, count(*) AS n_events
              FROM seg GROUP BY user_id, seg)
            SELECT user_id, event_type, valid_from_us,
                   coalesce(lead(valid_from_us)
                              OVER (PARTITION BY user_id ORDER BY seg),
                            -1) AS valid_to_us,
                   CASE WHEN lead(valid_from_us)
                              OVER (PARTITION BY user_id ORDER BY seg) IS NULL
                        THEN 1 ELSE 0 END AS is_current,
                   n_events
            FROM iv
            ORDER BY user_id, valid_from_us"""),
    "SCD-2 dimension build from an event log: run-length change detection " +
      "+ interval assembly, one shared shuffle+sort across all windows")

  // ----------------------------------------------------------- k-anonymity
  private val qKAnonymity = Q(
    "q_k_anonymity",
    (s, d) =>
      // Privacy-risk audit over the curation quasi-identifiers: any
      // (lang, source) equivalence class smaller than k=10 re-identifies
      // its members. One hash aggregate — the audit a release gate runs
      // before publishing a training corpus.
      documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("at_risk", when(col("group_size") < 10, 1L).otherwise(0L))
        .orderBy("lang", "source"),
    Some("""SELECT lang, source, count(*) AS group_size,
                   CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS at_risk
            FROM documents GROUP BY lang, source
            ORDER BY lang, source"""),
    "k-anonymity audit: quasi-identifier equivalence-class sizes with a " +
      "k=10 risk flag — the pre-release privacy gate for a training corpus")

  // ------------------------------------------------- stream-static enrich
  private val qStreamEnrich = Q(
    "q_stream_enrich",
    (s, d) => {
      // Stream-static join: the event stream enriched against a STATIC
      // dimension (nation, keyed by user_id % 25) — the canonical serving
      // topology where reference data rides every micro-batch as a
      // broadcast, no state store involved for the join itself (only the
      // downstream windowless aggregate holds state). Hash-equal to the
      // batch join oracle.
      val name = s"graft_stream_enrich_${RelationalQueries.streamRuns.incrementAndGet()}"
      val dim = nation(s, d)
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      val ev = RelationalQueries.streamEvents(s, d)
        .withColumn("nk", col("user_id") % 25)
        .join(broadcast(dim), "nk")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sum_value"))
      RelationalQueries.boundedReplay(s, name, ev, "complete")
        .select(col("n_name"), col("n"), col("sum_value").cast("double").as("sum_value"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events JOIN nation ON n_nationkey = user_id % 25
            GROUP BY n_name ORDER BY n_name"""),
    "stream-static broadcast enrichment through the bounded-replay " +
      "harness — dimension join per micro-batch, hash-equal to the batch " +
      "join oracle")

  // -------------------------------------------------------- blocklist gate
  /** Multi-word phrases on purpose: substring (not token) semantics, the
    * part `contains`-composition and the oracle agree on exactly.
    */
  private val blockTerms = Seq("spark merge", "customer query", "slow sort",
    "hash value", "window")

  private val qBlocklist = Q(
    "q_blocklist",
    (s, d) =>
      // Compliance/blocklist gate: flag documents containing any of m
      // phrases in ONE automaton pass (multi_match_count — Aho-Corasick
      // behind whole-stage codegen) instead of m chained contains() scans;
      // at 100 TB × hundreds of phrases the m× rescan IS the job cost.
      documents(s, d)
        .select(col("doc_id"),
          graft.functions.MultiMatch
            .multi_match_count(col("text"), blockTerms).as("n_hits"))
        .filter(col("n_hits") > 0)
        .orderBy("doc_id"),
    Some {
      val hits = blockTerms
        .map(t => s"CASE WHEN contains(text, '$t') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""SELECT doc_id, CAST($hits AS BIGINT) AS n_hits
         |FROM documents
         |WHERE $hits > 0
         |ORDER BY doc_id""".stripMargin
    },
    "blocklist gate: distinct-phrase hit count via a single Aho-Corasick " +
      "pass (custom codegen expression) — oracle replays with m contains()")

  def all: Seq[Q] = Seq(qKmeans, qShortestPath, qScd2, qKAnonymity,
    qStreamEnrich, qBlocklist)
}
