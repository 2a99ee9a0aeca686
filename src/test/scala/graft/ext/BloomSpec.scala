package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom sketch membership: no false negatives ever, bounded false
  * positives, and exactness of the two-branch decontamination.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = (0 until 200).map(i => (i.toLong, s"bench document $i"))
    .toDF("doc_id", "text")
  private lazy val corpus = (
    (1000 until 1800).map(i => (i.toLong, s"corpus document $i")) ++ // clean
    (0 until 50).map(i => (2000L + i, s"bench document ${i * 4}"))   // contaminated
  ).toDF("doc_id", "text")

  test("sketch probe has no false negatives on every trained item") {
    val sketch = Bloom.trainSketch(bench, "text", expectedItems = 256, numBits = 4096)
    val hits = bench.filter(Bloom.mightContain(sketch, xxhash64(col("text")))).count()
    assert(hits == 200L) // every member must probe true
  }

  test("false-positive rate is bounded at the configured sketch size") {
    val sketch = Bloom.trainSketch(bench, "text", expectedItems = 256, numBits = 4096)
    val nonMembers = (0 until 2000).map(i => s"absent document $i").toDF("text")
    val fp = nonMembers.filter(Bloom.mightContain(sketch, xxhash64(col("text")))).count()
    // 4096 bits / 256 items → theoretical fpp well under 1%; allow 5%
    assert(fp < 100, s"false-positive count $fp out of 2000 non-members")
  }

  test("an undersized sketch still yields EXACT decontamination (FPs verified away)") {
    // 64 bits for 200 items → heavy false positives by construction; the
    // two-branch plan must still return exactly the anti-join result
    val sketch = Bloom.trainSketch(bench, "text", expectedItems = 200, numBits = 64)
    val fpCount = corpus.filter(Bloom.mightContain(sketch, xxhash64(col("text")))).count()
    assert(fpCount > 50, s"expected many suspects from the tiny sketch, got $fpCount")
    val got = Bloom.decontaminateExact(corpus, "text", bench, "text", sketch)
      .select("doc_id").as[Long].collect().sorted
    val want = corpus.join(bench.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(want.length == 800) // the 50 planted contaminated rows are gone
  }

  test("empty benchmark → null sketch → corpus passes through unchanged") {
    val emptyBench = bench.filter(col("doc_id") < 0)
    val sketch = Bloom.trainSketch(emptyBench, "text", 256, 4096)
    assert(sketch == null) // Spark's bloom agg yields null at cardinality 0
    val out = Bloom.decontaminateExact(corpus, "text", emptyBench, "text", sketch)
    assert(out.count() == corpus.count())
  }

  test("sketch-free overload trains on the passed bench (coherence by construction)") {
    val got = Bloom.decontaminateExact(corpus, "text", bench, "text",
      expectedBenchItems = 256L)
    assert(got.count() == 800L)
  }

  test("registered SQL functions build and probe the sketch") {
    // constant probes constant-fold the hash to a (often negative) long
    // literal; graft's BloomProbe codegens that shape cleanly, where
    // Spark's own BloomFilterMightContain trips a Janino cast quirk and
    // falls back to interpreted eval (CodegenOnlySpec pins this).
    graft.GraftSql.registerFunctions(spark)
    bench.createOrReplaceTempView("bloom_bench_spec")
    val row = spark.sql("""
      WITH bf AS (SELECT bloom_filter_agg(xxhash64(text), 256L, 4096L) AS b
                  FROM bloom_bench_spec)
      SELECT might_contain((SELECT b FROM bf), xxhash64('bench document 7')) AS hit,
             might_contain((SELECT b FROM bf), xxhash64('definitely absent content')) AS miss
    """).head()
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1))
  }
}
