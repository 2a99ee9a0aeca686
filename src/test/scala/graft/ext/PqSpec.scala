package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{functions => gf}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("bitsPerCode addresses exactly the codebook") {
    assert(Pq.bitsPerCode(256) == 8)
    assert(Pq.bitsPerCode(16) == 4)
    assert(Pq.bitsPerCode(2) == 1)
    assert(Pq.bitsPerCode(17) == 5)
  }

  test("training is deterministic and encode packs in-range codes") {
    val corpus = randomCorpus(300, 16, seed = 11L)
    val a = Pq.trainCodebooks(corpus, "embedding", m = 4, codes = 8, iters = 2)
    val b = Pq.trainCodebooks(corpus, "embedding", m = 4, codes = 8, iters = 2)
    assert(a.length == 4 && a(0).length == 8 && a(0)(0).length == 4)
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) } })
    val bits = Pq.bitsPerCode(8)
    val packed = Pq.encode(corpus, "embedding", a).select("pq_code")
      .collect().map(_.getLong(0))
    // every 3-bit field in range, high bits beyond m*bits clear
    assert(packed.forall(p => (p >>> (4 * bits)) == 0L))
    // identical vectors encode identically (expression is a pure function)
    val dup = Seq((1L, Array.fill(16)(0.5f)), (2L, Array.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
    val dc = Pq.encode(dup, "embedding", a).select("pq_code")
      .collect().map(_.getLong(0))
    assert(dc(0) == dc(1))
  }

  test("full candidate width provably equals exact brute force") {
    val corpus = randomCorpus(400, 32, seed = 7L)
    val books = Pq.trainCodebooks(corpus, "embedding", m = 8, codes = 16, iters = 2)
    val q = corpus.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
    val got = Pq.searchRerank(Pq.encode(corpus, "embedding", books), corpus,
        "vec_id", "embedding", "pq_code", books, q, k = 10, candidates = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want))
    assert(got.head._1 == 3L && math.abs(got.head._2 - 1.0) < 1e-9)
  }

  test("ADC recall@10 at the documented operating point (5% candidates)") {
    // adversarial-for-PQ corpus: isotropic gaussians have no cluster
    // structure to quantize, so this recall is the floor, not the typical
    val corpus = randomCorpus(2000, 32, seed = 23L).cache()
    val books = Pq.trainCodebooks(corpus, "embedding", m = 8, codes = 16, iters = 3)
    val enc = Pq.encode(corpus, "embedding", books).cache()
    val recalls = (0 until 5).map { qi =>
      val q = corpus.filter(col("vec_id") === qi).head().getSeq[Float](1).toArray
      val got = Pq.searchRerank(enc, corpus, "vec_id", "embedding", "pq_code",
          books, q, k = 10, candidates = 100)
        .collect().map(_.getLong(0)).toSet
      val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      (got & want).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.7, s"mean recall@10 $mean below the pinned floor; got $recalls")
    corpus.unpersist(); enc.unpersist()
  }

  test("ADC scan is map-only (no Exchange) and reads only the codes table") {
    val corpus = randomCorpus(200, 16, seed = 3L)
    val books = Pq.trainCodebooks(corpus, "embedding", m = 4, codes = 8, iters = 1)
    val enc = Pq.encode(corpus, "embedding", books).select("vec_id", "pq_code")
    val q = Array.fill(16)(0.1f)
    val plan = Pq.adcScores(enc, "vec_id", "pq_code", books, q)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ADC scoring should be map-only:\n$plan")
    assert(!plan.toLowerCase.contains("embedding"),
      s"ADC must not touch the raw embedding column:\n$plan")
  }

  test("write-once index round-trips the model bit-exact and serves identically") {
    val tag = System.nanoTime()
    val prefix = s"pq_idx_$tag"
    val corpus = randomCorpus(300, 16, seed = 41L)
    val q = corpus.filter(col("vec_id") === 5).head().getSeq[Float](1).toArray
    try {
      val books = Pq.writePqIndex(corpus, "vec_id", "embedding", prefix,
        m = 4, codes = 8, iters = 2)
      val reloaded = Pq.loadCodebooks(spark, prefix)
      assert(books.zip(reloaded).forall { case (x, y) =>
        x.zip(y).forall { case (u, v) => u.sameElements(v) } })
      val served = Pq.rerankScoresIndex(spark, prefix, corpus, "vec_id",
          "embedding", q, candidates = 64)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val direct = Pq.rerankScores(Pq.encode(corpus, "embedding", books), corpus,
          "vec_id", "embedding", "pq_code", books, q, candidates = 64)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.sameElements(direct))
    } finally {
      Seq(s"${prefix}_codes", s"${prefix}_codebooks")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("zero-norm query and degenerate codewords score 0, deterministically") {
    val corpus = Seq(
      (1L, Array.fill(8)(0.0f)),
      (2L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val books = Pq.trainCodebooks(corpus, "embedding", m = 2, codes = 2, iters = 1)
    val enc = Pq.encode(corpus, "embedding", books)
    val scores = Pq.adcScores(enc, "vec_id", "pq_code", books, Array.fill(8)(0.0f))
      .collect().map(_.getDouble(1))
    assert(scores.forall(_ == 0.0))
  }
}
