package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * A range-sorted parquet layout gives file-level min/max skipping on ONE
  * column; queries filtering the second column still scan everything. The
  * Z-order key interleaves the bits of several columns, so sorting by it
  * clusters rows that are close in EVERY dimension — each output file
  * covers a tight hyper-rectangle and its footer statistics prune scans
  * filtered on ANY of the interleaved columns (the layout strategy behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). At 100 TB this is a write-time
  * maintenance pass: feed [[zorderKey]] to
  * [[graft.sources.Sources.compactParquet]]'s `sortCols` and the
  * compaction's range shuffle is the only cost.
  *
  * The key is built from static-unrolled builtin bit ops (shift/and/or) —
  * fully codegen'd, no UDF, no interpreted lambda — and the identical
  * arithmetic is expressible in ANSI SQL, so the mapping is
  * oracle-checkable bit-for-bit cross-engine (q_zorder).
  */
object Layout {

  /** Morton-interleave `bits` low bits of each column (column j's bit i
    * lands at position `i * cols.size + j`). Inputs must already lie in
    * `[0, 2^bits)` — bucket arbitrary domains first (e.g.
    * `pmod(c, lit(1 << bits))`, or an ntile rank for skewed ones); the
    * low-bits mask here makes out-of-range inputs wrap rather than
    * corrupt neighbouring columns' bit lanes.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zorderKey needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * columns must fit a signed long: $bits * ${cols.size} > 63")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (for oracle queries and
    * engine-portable DDL): `zorderKeySql(Seq("x", "y"), 8)` returns the
    * bit-for-bit equivalent of `zorderKey(Seq(col("x"), col("y")), 8)`.
    */
  def zorderKeySql(cols: Seq[String], bits: Int): String = {
    require(cols.size >= 2 && bits >= 1 && bits * cols.size <= 63,
      "zorderKeySql: same bounds as zorderKey")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Append a Z-order layout key over the given columns, each first
    * wrapped to the key's bit range (`pmod`, matching the wrap the mask
    * would apply — made explicit so the SQL twin agrees on negatives).
    */
  def withZorderKey(
      df: DataFrame,
      inputCols: Seq[String],
      bits: Int,
      keyCol: String = "zkey"): DataFrame =
    df.withColumn(keyCol,
      zorderKey(inputCols.map(c => pmod(col(c).cast("long"), lit(1L << bits))), bits))
}
