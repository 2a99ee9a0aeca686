package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("udaf-registered aggregator builds per-doc signatures; identical docs match") {
    spark.udf.register("minhash_sig", udaf(new MinHashAggregator(16)))
    val rows = Seq(
      (1L, "aa"), (1L, "bb"), (1L, "cc"),
      (2L, "aa"), (2L, "bb"), (2L, "cc"),   // identical shingle set as 1
      (3L, "zz"), (3L, "yy"))
      .toDF("doc_id", "shingle")
      .withColumn("h", xxhash64(col("shingle")))
    rows.createOrReplaceTempView("shingles_v")
    val sigs = spark.sql(
      "SELECT doc_id, minhash_sig(h) AS sig FROM shingles_v GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(sigs(1L).toSeq == sigs(2L).toSeq)
    assert(MinHashAggregator.estJaccard(sigs(1L), sigs(2L)) == 1.0)
    assert(MinHashAggregator.estJaccard(sigs(1L), sigs(3L)) < 0.5)
  }

  test("merge is commutative with reduce order (partial aggregation safety)") {
    val agg = new MinHashAggregator(8)
    val hashes = Seq(11L, 22L, 33L, 44L)
    val all = hashes.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = hashes.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(all.toSeq == merged.toSeq)
  }
}
