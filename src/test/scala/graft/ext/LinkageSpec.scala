package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    (1L, "Acme Corporation 001"),
    (2L, "Acme Corporation 002"),
    (3L, "Globex Industries 003"),
    (4L, "Initech Systems 004"),
    (5L, "Umbrella Holdings 005")).toDF("id", "name")

  test("planted typos link back to their source row") {
    // delete one mid-string char: suffix block key survives, JW stays high
    val dirty = clean.select(col("id").as("pid"),
      concat(substring(col("name"), 1, 4), expr("substring(name, 6)")).as("pname"))
    val out = Linkage.fuzzyJoin(dirty, clean, "pid", "pname", "id", "name",
        c => substring(c, -3, 3), threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("threshold filters non-matches; probes without candidates drop out") {
    val probe = Seq((9L, "Completely Different 001")).toDF("pid", "pname")
    val strict = Linkage.fuzzyJoin(probe, clean, "pid", "pname", "id", "name",
      c => substring(c, -3, 3), threshold = 0.95)
    assert(strict.count() == 0)
    // same block ("001") but low threshold admits it — score is honest
    val loose = Linkage.fuzzyJoin(probe, clean, "pid", "pname", "id", "name",
      c => substring(c, -3, 3), threshold = 0.1).collect()
    assert(loose.length == 1 && loose.head.getLong(1) == 1L)
    assert(loose.head.getDouble(2) < 0.95)
  }

  test("ncand audits blocking selectivity; ties break on match id") {
    // two identical reference names in one block: probe ties across both
    val dup = Seq((1L, "Same Name 001"), (2L, "Same Name 001"),
      (3L, "Other 002")).toDF("id", "name")
    val probe = Seq((7L, "Same Name 001")).toDF("pid", "pname")
    val rows = Linkage.fuzzyJoin(probe, dup, "pid", "pname", "id", "name",
      c => substring(c, -3, 3), threshold = 0.5).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 1L, "tie must break to the lower id")
    assert(rows.head.getDouble(2) == 1.0)
    assert(rows.head.getLong(3) == 2L, "ncand counts surviving candidates")
  }
}
