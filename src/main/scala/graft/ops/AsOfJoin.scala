package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, attach the latest right row
  * with `rightTs <= leftTs` for the same key (trades⋈quotes shape).
  *
  * Spark-first composition (SURVEY §2.2 as-of row): no custom physical
  * operator needed — tag both sides, union on (key, ts), and carry the
  * right side's values forward with `last(..., ignoreNulls)` over a
  * key-partitioned time window, then keep the left rows. Cost: ONE
  * shuffle on the key (the union sorts within partitions), same as any
  * keyed window — versus a naive range join's quadratic blowup. Skewed
  * keys shard like any window partition (salt via SkewUtils if one key
  * dominates).
  *
  * `tolerance`: optional max staleness; matches older than it are
  * nulled out.
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // one unioned relation: left rows carry their payload, right rows
    // carry the joinable values; _side breaks ts ties so a right row at
    // exactly leftTs is visible to that left row (side 0 sorts first)
    val taggedLeft = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_side", lit(1))
      .withColumn("_rts", lit(null).cast("timestamp"))
    val taggedRight = right
      .select((keyCol +: rightTsCol +: rightValueCols).map(col): _*)
      .withColumn("_ts", col(rightTsCol))
      .withColumn("_side", lit(0))
      .withColumn("_rts", col(rightTsCol))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"_asof_$c", last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w)))
      .withColumn("_asof_ts", last(when(col("_side") === 0, col("_rts")), ignoreNulls = true).over(w))

    val withinTolerance = tolerance match {
      case Some(tol) =>
        carried.withColumn("_ok",
          col("_asof_ts").isNotNull &&
            col("_ts").cast("long") - col("_asof_ts").cast("long") <= tol.cast("long"))
      case None => carried.withColumn("_ok", col("_asof_ts").isNotNull)
    }

    val result = rightValueCols.foldLeft(withinTolerance)((df, c) =>
      df.withColumn(s"asof_$c", when(col("_ok"), col(s"_asof_$c"))))
      .withColumn("asof_ts", when(col("_ok"), col("_asof_ts")))

    result
      .filter(col("_side") === 1)
      .select((leftCols.map(col) ++ rightValueCols.map(c => col(s"asof_$c")) :+ col("asof_ts")): _*)
  }
}
