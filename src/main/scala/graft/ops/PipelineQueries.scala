package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.engine.{Engine, RunOptions}
import graft.spec.{PipelineSpec, SegType, Stage}
import graft.stages.{CommandStage, ModuleRegistry}

/** The reference's NATIVE operator set — pipeline composition — exercised
  * end-to-end through the [[graft.engine.Engine]] planner, on the
  * `documents` corpus so the results are oracle-checkable.
  *
  * `q_pipe_uppercase` is the flagship parity query: the canonical reference
  * example `echo hello world | transform-uppercase`
  * (`/root/reference/test.js:5-13`, readme.md:29-41) re-expressed as
  * documents → uppercase module through a real pipeline spec.
  */
object PipelineQueries {

  /** documents.text as the engine's line-oriented data plane. The doc_id is
    * carried in-band (tab-separated) so pipeline outputs stay keyed — the
    * byte-stream analog of a keyed record.
    */
  private def docLines(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(concat_ws("\t", col("doc_id"), col("text")).as(CommandStage.ValueCol))

  private def splitBack(df: DataFrame): DataFrame =
    df.select(
      split(col(CommandStage.ValueCol), "\t").getItem(0).cast("long").as("doc_id"),
      split(col(CommandStage.ValueCol), "\t").getItem(1).as("text_out"))

  private val registry: ModuleRegistry = ModuleRegistry.default
    .register("uppercase_keep_key", df =>
      // uppercase the payload, not the key (keys are digits — unaffected by
      // upper() anyway, but keep the transform explicit)
      df.withColumn(CommandStage.ValueCol, upper(col(CommandStage.ValueCol))))
    .register("tokens_json", df =>
      // json:true module: sees structured rows, returns structured rows
      df.withColumn("n_tokens", size(split(col("text"), " ")).cast("long")))

  private val qPipeUppercase = Q(
    "q_pipe_uppercase",
    (s, d) => {
      val spec = PipelineSpec(ListMap(
        "flagship" -> Seq(Stage.Module("uppercase_keep_key"))))
      val out = new Engine(spec, registry)
        .run("flagship", s, input = Some(docLines(s, d)))
      splitBack(out).orderBy("doc_id")
    },
    Some("""SELECT doc_id, upper(text) AS text_out
            FROM documents ORDER BY doc_id"""),
    "flagship: echo|transform-uppercase parity through the Engine planner")

  private val qMapBroadcast = Q(
    "q_map_broadcast",
    (s, d) => {
      // map segment: source teed into two branches (index.js:62)
      val reg = registry
        .register("src_docs", _ => docLines(s, d))
        .register("branch_upper", df => splitBack(
          df.withColumn(CommandStage.ValueCol, upper(col(CommandStage.ValueCol))))
          .select(col("doc_id"), lit("upper").as("branch"), col("text_out").as("out")))
        .register("branch_len", df => splitBack(df)
          .select(col("doc_id"), lit("len").as("branch"),
            length(col("text_out")).cast("string").as("out")))
      val spec = PipelineSpec(ListMap("tee" -> Seq(
        Stage.Inline("src", df => docLines(s, d), SegType.MapTee),
        Stage.Module("branch_upper", SegType.MapTee),
        Stage.Module("branch_len", SegType.MapTee))))
      new Engine(spec, reg).run("tee", s).orderBy("branch", "doc_id")
    },
    Some("""SELECT * FROM (
              SELECT doc_id, 'upper' AS branch, upper(text) AS out FROM documents
              UNION ALL
              SELECT doc_id, 'len' AS branch, CAST(length(text) AS VARCHAR) AS out FROM documents)
            ORDER BY branch, doc_id"""),
    "map/tee composition: one cached source fanned into N branches")

  private val qReduceFanin = Q(
    "q_reduce_fanin",
    (s, d) => {
      // reduce segment: N producers piped into one aggregator (index.js:64)
      val reg = registry
        .register("agg_by_source", df => df
          .groupBy("source").agg(count(lit(1)).as("n"))
          .orderBy("source"))
        .register("docs_en", _ => Tables.documents(s, d).filter(col("lang") === "en"))
        .register("docs_fr", _ => Tables.documents(s, d).filter(col("lang") === "fr"))
      val spec = PipelineSpec(ListMap("fanin" -> Seq(
        Stage.Module("agg_by_source", SegType.Reduce),
        Stage.Module("docs_en", SegType.Reduce),
        Stage.Module("docs_fr", SegType.Reduce))))
      new Engine(spec, reg).run("fanin", s)
    },
    Some("""SELECT source, count(*) AS n FROM documents
            WHERE lang IN ('en', 'fr')
            GROUP BY source ORDER BY source"""),
    "reduce/fan-in composition: union of producers into a single aggregator")

  private val qExecPipe = Q(
    "q_exec_pipe",
    (s, d) => {
      // external command stage: tr-based uppercase over the byte stream —
      // `RDD.pipe` = process-per-partition `toStream` (index.js:14-27).
      // (Engine.exec's argv parity — 'exec' as argv[1], index.js:205 —
      // breaks argv-sensitive tools like tr; exercised in unit tests with
      // an argv-tolerant command instead.)
      val out = CommandStage(docLines(s, d), "tr 'a-z' 'A-Z'", partitions = Some(4))
      splitBack(out).orderBy("doc_id")
    },
    // byte-faithful oracle: translate() maps exactly the ASCII range tr
    // maps, so the check stays correct even if the corpus ever grows
    // non-ASCII text (upper() would diverge from tr there)
    Some("""SELECT doc_id,
                   translate(text, 'abcdefghijklmnopqrstuvwxyz',
                             'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS text_out
            FROM documents ORDER BY doc_id"""),
    "external-process stage via RDD.pipe with exit-code propagation")

  private val qUdfModule = Q(
    "q_udf_module",
    (s, d) => {
      // json:true module stage: NDJSON parse → transform → serialize
      // (index.js:73 parity), then parsed back out for checking.
      val lines = graft.stages.NdjsonBridge.serialize(
        Tables.documents(s, d).select("doc_id", "text"))
      val spec = PipelineSpec(ListMap(
        "ndjson_tokens" -> Seq(Stage.Module("tokens_json", json = true))))
      val out = new Engine(spec, registry).run("ndjson_tokens", s, Some(lines))
      graft.stages.NdjsonBridge.parse(out)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents ORDER BY doc_id"""),
    "module stage with json:true NDJSON framing round-trip")

  private val qFlatmap = Q(
    "q_flatmap",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "tok"),
    Some("""SELECT doc_id, tok, count(*) AS n
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
            GROUP BY doc_id, tok ORDER BY doc_id, tok"""),
    "one-to-many stage (UDTF analog): explode to token rows, re-aggregated " +
      "for a deterministic oracle")

  def all: Seq[Q] = Seq(
    qPipeUppercase, qMapBroadcast, qReduceFanin, qExecPipe, qUdfModule, qFlatmap)
}
