package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One declared, driver-checkable query: a Spark implementation plus (when
  * the semantics are SQL-expressible) an equivalent ANSI SQL string the
  * driver runs in DuckDB over the same parquet tables.
  *
  * Oracle discipline (SURVEY §5.2 / FIXTURES.md):
  *   - every oracle query ends in a total ORDER BY with a unique tiebreaker;
  *   - float-summation-order sensitivity is removed by aggregating DECIMAL
  *     casts (exact in both engines) and casting the result to DOUBLE;
  *   - integer-valued derived columns are cast to BIGINT on both sides
  *     (DuckDB SUM(int) is HUGEINT, length() is BIGINT, Spark is int/long);
  *   - `events.ts` is ns-precision parquet: Spark truncates to µs, DuckDB
  *     keeps ns, so raw `ts` never appears in an oracle output — only
  *     µs-stable derivations (hour(), date_trunc, epoch_us deltas).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Catalog {
  /** Exact-decimal cast used to make SUM/AVG order-insensitive. */
  private[graft] def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** All declared queries, in SURVEY §2.2 order. */
  def all: Seq[Q] =
    RelationalQueries.all ++ PipelineQueries.all ++ ExtQueries.all ++
      AdvancedQueries.all ++ TpchQueries.all ++ AnalyticsQueries.all ++
      EventAnalyticsQueries.all ++ DocFormatQueries.all ++ SidecarQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
