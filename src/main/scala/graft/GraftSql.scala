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
    tableNames.foreach { n =>
      // events goes through Tables.events so the SQL view sees the same
      // µs timestamp `ts` as the DataFrame surface (raw parquet ts is
      // TIMESTAMP(NANOS) read as long under the nanosAsLong flag)
      val df = if (n == "events") ops.Tables.events(spark, dir)
               else ops.Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

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
