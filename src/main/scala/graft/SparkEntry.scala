package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full declared-query surface lives in [[graft.ops.Catalog]]:
  * relational operators (SURVEY §2.2), pipeline-composition parity ops
  * (the reference's native operator set, §2.1), and the mandated
  * training-data extensions (dedup / similarity / text / multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the `echo hello world | transform-uppercase` parity pipeline
    * (`/root/reference/test.js:5-13`) run through the Engine planner.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipe_uppercase")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate / model-defined / external-process — unit-tested
    * instead).
    */
  def oracleSql: Map[String, String] = ops.Catalog.oracleSql
}
