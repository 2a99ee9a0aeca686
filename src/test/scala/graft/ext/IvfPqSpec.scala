package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Tables

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  /** Clustered corpus (the RecallCurve generator): residual encoding's
    * advantage only exists when vectors concentrate around centers —
    * which real encoder embeddings do and isotropic gaussians do not.
    */
  private def clusteredCorpus(n: Int, dim: Int, clusters: Int) =
    graft.tools.RecallCurve.corpus(spark, n, dim, clusters, noise = 0.5)

  test("ADC lookup score equals cosine of the reconstruction, exactly") {
    // the LUT algebra (⟨q,c⟩ + Σ ip[j][code] over sqrt(‖c‖² + Σ(2cdot+n2)))
    // must equal cosine(q, c + concat(codewords)) computed directly —
    // ties the codegen'd kernel to the definition it claims to implement
    val corpus = randomCorpus(300, 16, seed = 19L)
    val model = IvfPq.train(corpus, "embedding", cells = 4, m = 4, codes = 8, iters = 2)
    val q = corpus.filter(col("vec_id") === 2).head().getSeq[Float](1).toArray
    val allCells = model.centroids.indices.toArray
    val got = IvfPq.adcScores(
        IvfPq.encode(corpus, "vec_id", "embedding", model),
        "vec_id", model, q, allCells)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val enc = IvfPq.encode(corpus, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bits = model.bits
    val sub = 16 / 4
    enc.foreach { case (id, cell, packed) =>
      // reconstruction in DOUBLE — the LUT path never rounds c + r̂ to
      // float, so neither may the reference computation
      val rec = new Array[Double](16)
      val cent = model.centroids(cell)
      for (j <- 0 until 4) {
        val code = ((packed >>> (j * bits)) & ((1L << bits) - 1)).toInt
        val cw = model.books(j)(code)
        for (i <- 0 until sub) rec(j * sub + i) = cent(j * sub + i).toDouble + cw(i)
      }
      val (dot, n2) = rec.zip(q).foldLeft((0.0, 0.0)) { case ((d, n), (r, qi)) =>
        (d + r * qi, n + r * r)
      }
      val qn = math.sqrt(q.map(v => v.toDouble * v).sum)
      val want = if (n2 == 0.0 || qn == 0.0) 0.0 else dot / (math.sqrt(n2) * qn)
      assert(math.abs(got(id) - want) < 1e-9,
        s"vec $id: ADC ${got(id)} != reconstruction cosine $want")
    }
  }

  test("full probe + full candidate width provably equals exact brute force") {
    val corpus = randomCorpus(400, 32, seed = 29L)
    val model = IvfPq.train(corpus, "embedding", cells = 4, m = 8, codes = 16, iters = 2)
    val q = corpus.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
    val got = IvfPq.rerankScores(
        IvfPq.encode(corpus, "vec_id", "embedding", model), corpus,
        "vec_id", "embedding", model, q, nprobe = 4, candidates = 1 << 20)
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want))
    assert(got.head._1 == 3L && math.abs(got.head._2 - 1.0) < 1e-9)
  }

  test("residual encoding beats raw PQ at the same code budget (clustered corpus)") {
    // the reason IVFADC exists: quantizing x − c(x) instead of x buys
    // recall at equal bytes. Deterministic corpus + deterministic
    // training → this is a fixed measurement, not a flaky sample.
    val corpus = clusteredCorpus(2000, 32, clusters = 16).cache()
    val model = IvfPq.train(corpus, "embedding", cells = 16, m = 8, codes = 16, iters = 3)
    val books = Pq.trainCodebooks(corpus, "embedding", m = 8, codes = 16, iters = 3)
    val encIvf = IvfPq.encode(corpus, "vec_id", "embedding", model).cache()
    val encPq = Pq.encode(corpus, "embedding", books).cache()
    val (ivfR, pqR) = (0 until 5).map { qi =>
      val q = corpus.filter(col("vec_id") === qi).head().getSeq[Float](1).toArray
      val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val ivf = IvfPq.rerankScores(encIvf, corpus, "vec_id", "embedding",
          model, q, nprobe = 16, candidates = 100)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val pq = Pq.searchRerank(encPq, corpus, "vec_id", "embedding", "pq_code",
          books, q, k = 10, candidates = 100)
        .collect().map(_.getLong(0)).toSet
      ((ivf & want).size / 10.0, (pq & want).size / 10.0)
    }.unzip
    val (ivfMean, pqMean) = (ivfR.sum / 5, pqR.sum / 5)
    assert(ivfMean >= 0.9, s"IVFADC recall@10 $ivfMean below floor; got $ivfR")
    assert(ivfMean >= pqMean,
      s"residual encoding must not lose to raw PQ here: ivf=$ivfMean pq=$pqMean")
    corpus.unpersist(); encIvf.unpersist(); encPq.unpersist()
  }

  test("pruned recall at the documented operating point (nprobe=4/16, 5% candidates)") {
    val corpus = clusteredCorpus(2000, 32, clusters = 16).cache()
    val model = IvfPq.train(corpus, "embedding", cells = 16, m = 8, codes = 16, iters = 3)
    val enc = IvfPq.encode(corpus, "vec_id", "embedding", model).cache()
    val recalls = (0 until 5).map { qi =>
      val q = corpus.filter(col("vec_id") === qi).head().getSeq[Float](1).toArray
      val got = IvfPq.rerankScores(enc, corpus, "vec_id", "embedding",
          model, q, nprobe = 4, candidates = 100)
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val want = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      (got & want).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"mean recall@10 $mean below the pinned floor; got $recalls")
    corpus.unpersist(); enc.unpersist()
  }

  test("ADC scan is map-only, code-table-only; index probe prunes partitions") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    val prefix = "spec_ivfpq_idx"
    try {
      val model = IvfPq.writeIvfPqIndex(emb, "vec_id", "embedding", prefix,
        cells = 4, m = 8, codes = 16, iters = 1, basePath = Some(dir))
      val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      // reloaded model is bit-exact
      val reloaded = IvfPq.loadModel(spark, prefix)
      assert(reloaded.centroids.zip(model.centroids)
        .forall { case (a, b) => a.sameElements(b) })
      assert(reloaded.books.zip(model.books).forall { case (x, y) =>
        x.zip(y).forall { case (u, v) => u.sameElements(v) } })
      // the ADC stage alone: map-only over the codes table, raw
      // embedding column never read
      val probeCells = graft.functions.IvfCells
        .computeCells(q, model.centroids, 1).toIntArray()
      val adc = IvfPq.adcScores(spark.table(s"${prefix}_codes"),
        "vec_id", model, q, probeCells)
      val plan = adc.queryExecution.executedPlan
      assert(!plan.toString.contains("Exchange"),
        s"ADC scoring should be map-only:\n$plan")
      assert(!plan.toString.toLowerCase.contains("embedding"),
        s"ADC must not touch the raw embedding column:\n$plan")
      // nprobe=1 probe reaches the scan as a PARTITION filter: exactly
      // one cell directory is read
      val scan = plan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in ADC plan"))
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "ivf_cell")),
        s"probe must prune partitions; got ${scan.partitionFilters}")
      adc.collect()
      assert(scan.metrics("numPartitions").value == 1L)
      // and the full index serve path equals brute force at full width
      val served = IvfPq.rerankScoresIndex(spark, prefix, emb, "vec_id",
          "embedding", q, nprobe = 4, candidates = 1 << 20)
        .orderBy(col("score").desc, col("vec_id")).limit(5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.sameElements(brute))
    } finally {
      Seq(s"${prefix}_codes", s"${prefix}_centroids", s"${prefix}_codebooks")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("zero-norm query scores 0 everywhere, deterministically") {
    val corpus = randomCorpus(50, 8, seed = 5L)
    val model = IvfPq.train(corpus, "embedding", cells = 2, m = 2, codes = 4, iters = 1)
    val scores = IvfPq.adcScores(
        IvfPq.encode(corpus, "vec_id", "embedding", model),
        "vec_id", model, Array.fill(8)(0.0f), model.centroids.indices.toArray)
      .collect().map(_.getDouble(1))
    assert(scores.forall(_ == 0.0))
  }
}
