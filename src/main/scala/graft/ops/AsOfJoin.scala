package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, attach the latest right row
  * with `rightTs <= leftTs` for the same key (trades⋈quotes shape).
  *
  * Spark-first composition (SURVEY §2.2 as-of row): no custom physical
  * operator needed — tag both sides, union on (key, ts), and carry the
  * right side forward with `last(..., ignoreNulls)` over a
  * key-partitioned time window, then keep the left rows. Cost: ONE
  * shuffle on the key (the union sorts within partitions), same as any
  * keyed window — versus a naive range join's quadratic blowup. Skewed
  * keys shard like any window partition (salt via SkewUtils if one key
  * dominates).
  *
  * The whole right row rides as ONE struct through a single
  * `last(ignoreNulls)`, so every `asof_*` output field comes from the
  * SAME right row — per-column carries would mix rows whenever a right
  * value column is null (a null `bid` would fall back to an older row's
  * bid while `asof_ts` reported the newer row's timestamp, letting a
  * tolerance check validate a stale value).
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
    // carry (ts + values) as one struct; _side breaks ts ties so a right
    // row at exactly leftTs is visible to that left row (side 0 first)
    val taggedLeft = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_side", lit(1))
    val taggedRight = right
      .select(col(keyCol),
        col(rightTsCol).as("_ts"),
        lit(0).as("_side"),
        struct((col(rightTsCol).as("_rts") +: rightValueCols.map(col)): _*).as("_rrow"))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // left rows have _rrow = null (unionByName fill), so no when() needed
    val carried = unioned.withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))

    val ok = tolerance match {
      case Some(tol) =>
        col("_asof").isNotNull &&
          col("_ts").cast("long") - col("_asof._rts").cast("long") <= tol.cast("long")
      case None => col("_asof").isNotNull
    }

    carried
      .filter(col("_side") === 1)
      .withColumn("_ok", ok)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => when(col("_ok"), col(s"_asof.$c")).as(s"asof_$c")) :+
        when(col("_ok"), col("_asof._rts")).as("asof_ts")): _*)
  }
}
