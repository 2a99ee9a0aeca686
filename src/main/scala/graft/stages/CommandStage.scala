package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-process stage — the Spark-native analog of the reference's
  * `toStream` (`/root/reference/index.js:14-27`): a shell command bridged
  * via stdin/stdout, non-zero exit failing the stream.
  *
  * Mapping differences (documented, SURVEY §7.3):
  *   - the reference spawns ONE process per stage; `RDD.pipe` spawns one
  *     process *per partition* — the distributed generalization. Tests that
  *     need strict single-process parity pass `partitions = Some(1)`.
  *   - non-zero exit: `RDD.pipe` (checkCode=true) throws
  *     `Pipe function exited with status N`, reproducing
  *     `Error('Process exited with code: N')` (index.js:16-18).
  *   - stderr: surfaces in executor logs rather than an inherited fd
  *     (index.js:20-23).
  */
object CommandStage {

  /** Data-plane contract: a single `value: string` column — the
    * line-oriented analog of gasket's byte stream (§1.1: records are raw
    * bytes; the closest "row" is a line).
    */
  val ValueCol = "value"

  def apply(
      input: DataFrame,
      command: String,
      params: Seq[String] = Nil,
      env: Map[String, String] = Map.empty,
      partitions: Option[Int] = None,
      cwd: Option[String] = None): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    // Params are appended to the command line, shell-quoted — parity with
    // `p.params` argv appending (index.js:85, npm-execspawn behavior).
    // cwd: RDD.pipe has no working-directory knob, so the shell cd's first
    // (execspawn's cwd option parity, index.js:124) — relative paths in
    // commands resolve against the config directory. Only meaningful
    // where the path exists on every executor (shared FS / local mode).
    val base = (command +: params.map(shellQuote)).mkString(" ")
    val full = cwd.filter(_ != ".")
      .fold(base)(d => s"cd ${shellQuote(d)} && ($base)")
    val lines = input.select(ValueCol).as[String]
    val sized = partitions.fold(lines)(n => lines.coalesce(n))
    val piped = sized.rdd.pipe(
      Seq("/bin/sh", "-c", full),
      env,
      null, null, false, 8192, java.nio.charset.StandardCharsets.UTF_8.name())
    spark.createDataset(piped).toDF(ValueCol)
  }

  /** Source form: run the command against empty stdin — how a leading
    * `echo …` stage behaves when the pipeline head's writable side is
    * closed (`pipe.end()`, index.js:54).
    */
  def source(
      spark: SparkSession,
      command: String,
      params: Seq[String] = Nil,
      env: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    apply(Seq.empty[String].toDF(ValueCol), command, params, env, partitions = Some(1))
  }

  private[graft] def shellQuote(s: String): String =
    "'" + s.replace("'", "'\\''") + "'"
}
