package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the bloom/decontamination family to WHOLE-codegen execution:
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` turns Spark's silent
  * codegen→interpreter fallback (a CompileException logged once, then a
  * slower interpreted projection in production) into a hard test failure.
  * Round-12 full-suite logs carried exactly one such fallback
  * (`Expression "java.lang.Long" is not an rvalue`) in this region; this
  * spec keeps the family codegen-clean.
  */
class CodegenOnlySpec extends SparkSpec {

  private def withCodegenOnly[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    f(s)
  }

  test("bloom probe + exact decontamination compile under CODEGEN_ONLY") {
    withCodegenOnly { s =>
      import s.implicits._
      val bench = (0 until 200).map(i => (i.toLong, s"bench document $i"))
        .toDF("doc_id", "text")
      val corpus = (
        (1000 until 1800).map(i => (i.toLong, s"corpus document $i")) ++
        (0 until 50).map(i => (2000L + i, s"bench document ${i * 4}"))
      ).toDF("doc_id", "text")
      val sketch = Bloom.trainSketch(bench, "text", 256, 4096)
      val hits = bench.filter(Bloom.mightContain(sketch, xxhash64(col("text")))).count()
      assert(hits == 200L)
      val clean = Bloom.decontaminateExact(corpus, "text", bench, "text", sketch).count()
      assert(clean == 800L)
    }
  }

  test("CONSTANT probe (negative folded literal) compiles under CODEGEN_ONLY") {
    // the exact round-12 fallback shape: a constant probe folds
    // xxhash64('…') to a NEGATIVE long literal, and Spark's own
    // BloomFilterMightContain emits (Long)-123L — the Janino
    // class-name-minus-literal ambiguity. BloomProbe must codegen it.
    withCodegenOnly { s =>
      import s.implicits._
      val bench = (0 until 64).map(i => s"bench document $i").toDF("text")
      graft.GraftSql.registerFunctions(s)
      bench.createOrReplaceTempView("codegen_bloom_bench")
      // xxhash64('bench document 7') = -4891596160821384199 (negative) —
      // the folded-literal probe that failed; assert the shape holds
      val h = s.sql("SELECT xxhash64('bench document 7') AS h").head().getLong(0)
      assert(h < 0, s"fixture drifted: expected a negative folded hash, got $h")
      val row = s.sql("""
        WITH bf AS (SELECT bloom_filter_agg(xxhash64(text), 64L, 4096L) AS b
                    FROM codegen_bloom_bench)
        SELECT might_contain((SELECT b FROM bf), xxhash64('bench document 7')) AS hit,
               might_contain((SELECT b FROM bf), xxhash64('definitely absent')) AS miss
      """).head()
      assert(row.getBoolean(0) && !row.getBoolean(1))
    }
  }

  test("the decontamination query family compiles under CODEGEN_ONLY") {
    withCodegenOnly { s =>
      for (q <- Seq("q_decontaminate", "q_decontaminate_bloom", "q_join_bloom"))
        assert(graft.SparkEntry.queries(q)(s, sfDir).count() >= 0L, q)
    }
  }

  test("the sketch query family compiles under CODEGEN_ONLY") {
    withCodegenOnly { s =>
      for (q <- Seq("q_heavy_hitters_cms", "q_hll_shards", "q_corpus_overlap_est"))
        assert(graft.SparkEntry.queries(q)(s, sfDir).count() >= 0L, q)
    }
  }
}
