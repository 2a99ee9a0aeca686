package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-smoke simulation (t1): run SparkEntry.entry on a plain session
  * (deliberately WITHOUT the nanosAsLong flag — the driver's own session
  * may not set it, and entry() must not depend on it).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    require(n > 0, "entry() must return rows")
    spark.stop()
  }
}
