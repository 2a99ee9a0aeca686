package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Write-once/reload lifecycle for the tokenizer model artifacts — the
  * [[Similarity.writeIvfIndex]]/[[Similarity.loadIvfCentroids]] discipline
  * applied to the three trained tokenizers. Training is expensive (a
  * corpus histogram + a driver model loop); serving is a map-only scan
  * with the model as a plan reference object — so the model is written
  * ONCE as a catalog table beside the corpus it tokenizes and reloaded
  * bit-identically by every later serving session. Order columns
  * (`rank`/`piece_id`) make the reload exact: merge RANK is semantic in
  * BPE (apply order), and vocab iteration order feeds deterministic
  * tie-breaks.
  */
object TokenizerStore {

  /** Overwrite-proof managed-table create: a crashed/previous JVM can
    * leave the table's warehouse DIRECTORY behind without its catalog
    * entry, and `mode("overwrite")` then fails with
    * LOCATION_ALREADY_EXISTS (Spark validates the location on CREATE).
    * Drop the entry AND clear the stale location first.
    */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(wh, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists())
      try org.apache.commons.io.FileUtils.deleteDirectory(loc)
      catch { case _: Exception => () }
  }

  def writeBpe(spark: SparkSession, merges: Seq[(String, String)],
      table: String): Unit = {
    reset(spark, table)
    Bpe.mergesDf(spark, merges).write.mode("overwrite").saveAsTable(table)
  }

  def loadBpe(spark: SparkSession, table: String): Seq[(String, String)] =
    spark.table(table).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  def writeWordPiece(spark: SparkSession, vocab: Seq[String],
      table: String): Unit = {
    reset(spark, table)
    WordPiece.vocabDf(spark, vocab).write.mode("overwrite").saveAsTable(table)
  }

  def loadWordPiece(spark: SparkSession, table: String): Seq[String] =
    spark.table(table).orderBy("piece_id")
      .select("piece").collect().map(_.getString(0)).toSeq

  def writeUnigram(spark: SparkSession, pieces: Seq[(String, Double)],
      table: String): Unit = {
    reset(spark, table)
    Unigram.vocabDf(spark, pieces).write.mode("overwrite").saveAsTable(table)
  }

  def loadUnigram(spark: SparkSession, table: String): Seq[(String, Double)] =
    spark.table(table).orderBy("rank")
      .select("piece", "log_prob").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
}
