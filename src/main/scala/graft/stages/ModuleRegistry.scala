package graft.stages

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named-transform registry — the Spark analog of the reference's module
  * resolution (`compileModule`, `/root/reference/index.js:71-74`): where
  * gasket `require()`s an npm id and calls it for a through-stream, we look
  * up a named `DataFrame => DataFrame`.
  *
  * Immutable: `register` returns a new registry (specs stay shareable
  * across concurrent pipeline builds).
  */
final class ModuleRegistry private (
    private val modules: Map[String, DataFrame => DataFrame]) {

  def register(name: String, fn: DataFrame => DataFrame): ModuleRegistry =
    new ModuleRegistry(modules.updated(name, fn))

  def resolve(name: String): DataFrame => DataFrame =
    modules.getOrElse(name, throw new NoSuchElementException(
      s"Cannot find module '$name' " +
        "(reference: resolve.sync throws the same way, index.js:72)"))

  def contains(name: String): Boolean = modules.contains(name)
  def names: Seq[String] = modules.keys.toSeq.sorted
}

object ModuleRegistry {

  /** Built-ins. `uppercase` is the flagship-parity module: the canonical
    * reference example pipes through `transform-uppercase`
    * (`/root/reference/test.js:11`, readme.md:36-39).
    */
  val default: ModuleRegistry = new ModuleRegistry(Map.empty)
    .register("identity", df => df)
    .register("uppercase", df =>
      df.withColumn(CommandStage.ValueCol, upper(col(CommandStage.ValueCol))))
    .register("lowercase", df =>
      df.withColumn(CommandStage.ValueCol, lower(col(CommandStage.ValueCol))))
    .register("linecount", df => {
      // `wc -l`-style terminal stage: one line holding the count
      df.groupBy().agg(count(lit(1)).cast("string").as(CommandStage.ValueCol))
    })
    // Curation modules: the ext/ text operators exposed at the line level,
    // so a gasket-style JSON pipeline composes them exactly like any Unix
    // stage (the reference's whole model — and the `sort -u` / `shuf`
    // analogs in particular — but distributed):
    .register("normalize", df =>
      df.withColumn(CommandStage.ValueCol,
        graft.ext.TextAnalysis.normalize(col(CommandStage.ValueCol))))
    .register("redact", df =>
      df.withColumn(CommandStage.ValueCol,
        graft.ext.TextAnalysis.redact(col(CommandStage.ValueCol))))
    .register("dedup-lines", df =>
      // `sort -u` analog, order-free: exact dedup on line content
      df.dropDuplicates(CommandStage.ValueCol))
    .register("shuffle-lines", df =>
      // deterministic `shuf` analog: content-addressed md5 order — the
      // same reproducible permutation TextAnalysis.shuffleShards uses,
      // independent of input order and partitioning
      df.orderBy(md5(col(CommandStage.ValueCol)), col(CommandStage.ValueCol)))
}
