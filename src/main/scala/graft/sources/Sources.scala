package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.stages.{CommandStage, NdjsonBridge}

/** Source/sink surface of the engine.
  *
  * The reference's data plane is stdin/stdout byte streams with optional
  * NDJSON framing (`/root/reference/index.js:14-27,73`); files enter via
  * shell stages (`cat file`). Here each transport is a first-class typed
  * reader/writer on Spark's native connectors, so scans prune/push down
  * and writes are partitioned:
  *
  *   - lines: text files ↔ the `value`-column byte-stream analog;
  *   - ndjson: text lines parsed to structured rows (schema inference or
  *     explicit schema — the scale path, no inference pass);
  *   - parquet/csv/json: standard columnar/row formats;
  *   - binary: whole-file payloads for multimodal columns
  *     (`binaryFile` connector: path, modificationTime, length, content).
  */
object Sources {

  // ------------------------------------------------------------- readers

  /** Text lines as the engine's pipe-data-plane (`value: string`). */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", CommandStage.ValueCol)

  /** NDJSON file → structured rows. Pass a schema at scale (inference
    * costs an extra pass).
    */
  def ndjson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    NdjsonBridge.parse(lines(spark, path), schema)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Whole-file binary payloads (images/audio/video) with file metadata —
    * the ingestion path for [[graft.ext.Multimodal]].
    */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("length").as("byte_len"), col("content").as("payload"))

  /** Streaming variants — same schemas, unbounded (`gasket pipe` analog:
    * stdin stays open, bin.js:157-184).
    */
  def linesStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).withColumnRenamed("value", CommandStage.ValueCol)

  def ndjsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    NdjsonBridge.parse(linesStream(spark, path), Some(schema))

  // --------------------------------------------------------------- sinks

  /** Structured rows → NDJSON text files (ndjson.serialize parity). */
  def writeNdjson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    NdjsonBridge.serialize(df).write.mode(mode).text(path)

  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** Compact a parquet dataset into ~`targetBytes` files, optionally
    * range-sorted so every output file covers a tight key range and its
    * row-group min/max statistics support predicate skipping on read.
    *
    * The small-files problem is the chronic operational failure of a
    * 100 TB ingest pipeline (per-file open/footer cost dominates scans;
    * driver file-listing balloons): streaming sinks and fine-grained
    * upstream partitioning produce thousands of KB-sized files. This is
    * the standard maintenance pass: one job, one shuffle (none when
    * `sortCols` is empty — plain coalesce), idempotent output.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    val hadoopPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(hadoopPath, true)
    var totalBytes = 0L
    var filesBefore = 0
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        totalBytes += f.getLen
        filesBefore += 1
      }
    }
    // parquet compresses ~2-4x better than its in-memory width; sizing by
    // ON-DISK bytes of the input is the honest target
    val numFiles = math.max((totalBytes / math.max(targetBytes, 1L)).toInt, 1)
    val df = spark.read.parquet(inPath)
    val shaped =
      if (sortCols.nonEmpty)
        // range partition + in-file sort: each output file covers a tight
        // key range → min/max row-group stats prune reads on that key
        df.repartitionByRange(numFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(numFiles)
    shaped.write.mode(SaveMode.Overwrite).parquet(outPath)
    val outFiles = fs.listFiles(new org.apache.hadoop.fs.Path(outPath), true)
    var filesAfter = 0
    while (outFiles.hasNext) {
      if (outFiles.next().getPath.getName.endsWith(".parquet")) filesAfter += 1
    }
    (filesBefore, filesAfter)
  }

  /** ORC source/sink — the other columnar format a lakehouse pipeline
    * meets; schema rides in the files, so reads need no external schema.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed managed table: pre-shuffles once at write time so repeated
    * equi-joins/aggregations on the bucket key run WITHOUT a shuffle —
    * the co-located-join layout for fact⋈fact at 100 TB (write cost is
    * paid once, every downstream join on the key is exchange-free).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** stdout sink (CLI `gasket run` prints to stdout, bin.js:149). Driver-
    * side by nature, but streamed through `toLocalIterator` so only ONE
    * partition's rows are resident on the driver heap at a time — a
    * whole-result `collect()` would cap output size at driver memory.
    */
  def printLines(df: DataFrame, limit: Int = 1000): Unit = {
    val projected = df.select(CommandStage.ValueCol)
    val limited = if (limit == Int.MaxValue) projected else projected.limit(limit)
    val it = limited.toLocalIterator()
    while (it.hasNext) println(it.next().getString(0))
  }
}
