package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface bootstrap: register the corpus tables as temp views and the
  * custom Catalyst expressions as SQL functions, so the whole engine is
  * usable from `spark.sql(...)` — the declarative twin of the programmatic
  * DataFrame API.
  */
object GraftSql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n =>
      ops.Tables.table(spark, dir, n).createOrReplaceTempView(n))

  /** Same builders as [[GraftExtensions]], applied to a live session. */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }

  def bootstrap(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerFunctions(spark)
  }
}
