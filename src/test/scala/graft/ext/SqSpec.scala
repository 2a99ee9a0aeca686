package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SqSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("encode: in-range bytes, degenerate dims and extremes are deterministic") {
    assert(graft.functions.Sq8.encodeComponent(0.5, 0.0, 1.0) == 128)
    assert(graft.functions.Sq8.encodeComponent(0.0, 0.0, 1.0) == 0)
    assert(graft.functions.Sq8.encodeComponent(1.0, 0.0, 1.0) == 255)
    assert(graft.functions.Sq8.encodeComponent(2.0, 0.0, 1.0) == 255) // clamp hi
    assert(graft.functions.Sq8.encodeComponent(-1.0, 0.0, 1.0) == 0) // clamp lo
    assert(graft.functions.Sq8.encodeComponent(0.7, 0.3, 0.3) == 0) // degenerate
    assert(graft.functions.Sq8.encodeComponent(Double.NaN, 0.0, 1.0) == 0)
    val corpus = randomCorpus(200, 16, seed = 13L)
    val (lo, hi) = Sq.trainBounds(corpus, "embedding")
    assert(lo.length == 16 && lo.zip(hi).forall { case (l, h) => l <= h })
    // every corpus vector is inside its own trained bounds: extreme rows
    // encode to 0/255 and every code round-trips within one step
    val enc = Sq.encode(corpus, "embedding", lo, hi)
      .select("vec_id", "embedding", "sq_code").collect()
    enc.foreach { r =>
      val v = r.getSeq[Float](1)
      val c = r.getAs[Array[Byte]](2)
      assert(c.length == 16)
      v.indices.foreach { i =>
        val step = if (hi(i) > lo(i)) (hi(i) - lo(i)) / 255.0 else 0.0
        val rec = lo(i) + (c(i) & 0xff) * step
        assert(math.abs(rec - v(i)) <= step / 2 + 1e-6,
          s"dim $i: $rec vs ${v(i)} (step $step)")
      }
    }
  }

  test("SQ8 score equals cosine of the reconstruction, exactly") {
    val corpus = randomCorpus(200, 16, seed = 31L)
    val (lo, hi) = Sq.trainBounds(corpus, "embedding")
    val q = corpus.filter(col("vec_id") === 4).head().getSeq[Float](1).toArray
    val got = Sq.adcScores(Sq.encode(corpus, "embedding", lo, hi),
        "vec_id", lo, hi, q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val codes = Sq.encode(corpus, "embedding", lo, hi)
      .select("vec_id", "sq_code").collect()
    codes.foreach { r =>
      val c = r.getAs[Array[Byte]](1)
      val rec = c.indices.map { i =>
        val step = if (hi(i) > lo(i)) (hi(i).toDouble - lo(i)) / 255.0 else 0.0
        lo(i).toDouble + (c(i) & 0xff) * step
      }
      val (dot, n2) = rec.zip(q).foldLeft((0.0, 0.0)) { case ((d, n), (x, qi)) =>
        (d + x * qi, n + x * x)
      }
      val qn = math.sqrt(q.map(v => v.toDouble * v).sum)
      val want = if (n2 == 0.0 || qn == 0.0) 0.0 else dot / (math.sqrt(n2) * qn)
      assert(math.abs(got(r.getLong(0)) - want) < 1e-9)
    }
  }

  test("full candidate width provably equals exact brute force") {
    val corpus = randomCorpus(400, 32, seed = 43L)
    val (lo, hi) = Sq.trainBounds(corpus, "embedding")
    val q = corpus.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
    val got = Sq.rerankScores(Sq.encode(corpus, "embedding", lo, hi), corpus,
        "vec_id", "embedding", lo, hi, q, candidates = 1 << 20)
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want))
  }

  test("4x compression is near-exact: recall@10 at a THIN rerank width") {
    // SQ8's value proposition vs PQ: at candidates=20 on structureless
    // gaussians (PQ's floor regime) the byte codes still rank the true
    // neighbors first — per-dimension quantization error is tiny relative
    // to inter-vector distances
    val corpus = randomCorpus(2000, 32, seed = 59L).cache()
    val (lo, hi) = Sq.trainBounds(corpus, "embedding")
    val enc = Sq.encode(corpus, "embedding", lo, hi).cache()
    val recalls = (0 until 5).map { qi =>
      val q = corpus.filter(col("vec_id") === qi).head().getSeq[Float](1).toArray
      val got = Sq.rerankScores(enc, corpus, "vec_id", "embedding", lo, hi, q,
          candidates = 20)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      (got & want).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.95, s"SQ8 recall@10 $mean below floor; got $recalls")
    corpus.unpersist(); enc.unpersist()
  }

  test("ADC scan is map-only and never reads the raw embedding column") {
    val corpus = randomCorpus(200, 16, seed = 3L)
    val (lo, hi) = Sq.trainBounds(corpus, "embedding")
    val enc = Sq.encode(corpus, "embedding", lo, hi).select("vec_id", "sq_code")
    val plan = Sq.adcScores(enc, "vec_id", lo, hi, Array.fill(16)(0.1f))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"SQ8 scoring should be map-only:\n$plan")
    assert(!plan.toLowerCase.contains("embedding"),
      s"SQ8 ADC must not touch the raw embedding column:\n$plan")
  }

  test("write-once index round-trips bounds bit-exact and serves identically") {
    val prefix = s"sq_idx_${System.nanoTime()}"
    val corpus = randomCorpus(300, 16, seed = 47L)
    val q = corpus.filter(col("vec_id") === 5).head().getSeq[Float](1).toArray
    try {
      val (lo, hi) = Sq.writeSqIndex(corpus, "vec_id", "embedding", prefix)
      val (lo2, hi2) = Sq.loadBounds(spark, prefix)
      assert(lo.sameElements(lo2) && hi.sameElements(hi2))
      val served = Sq.rerankScoresIndex(spark, prefix, corpus, "vec_id",
          "embedding", q, candidates = 64)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val direct = Sq.rerankScores(Sq.encode(corpus, "embedding", lo, hi),
          corpus, "vec_id", "embedding", lo, hi, q, candidates = 64)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.sameElements(direct))
    } finally {
      Seq(s"${prefix}_codes", s"${prefix}_bounds")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
