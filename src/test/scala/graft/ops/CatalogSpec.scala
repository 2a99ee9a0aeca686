package graft.ops

import graft.{SparkSpec, SparkEntry}

/** Contract-level checks on the declared query surface. */
class CatalogSpec extends SparkSpec {

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across sub-catalogs") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("flagship entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL avoids Spark-only function names (spot checks)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.contains("xxhash64"))
      assert(!sql.toLowerCase.contains("approx_count_distinct"))
    }
  }

  test("every declared query runs at sf0.001 and is non-empty") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
