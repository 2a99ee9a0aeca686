package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def planted = {
    // separable corpus: positives carry a marker token, shared filler on
    // both classes so the classifier must isolate the marker's bucket
    val pos = (0 until 20).map(i => (i.toLong, s"common filler words zzspam zzspam item $i", 1))
    val neg = (100 until 120).map(i => (i.toLong, s"common filler words plain item $i", 0))
    (pos ++ neg).toDF("doc_id", "text", "label")
  }

  test("train separates a planted marker token perfectly") {
    val m = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = 60, lr = 5.0)
    val scored = Classifier.score(planted, "doc_id", "text", m,
        Classifier.hashIndex(_, dim))
      .join(planted.select("doc_id", "label"), "doc_id")
    val wrong = scored.filter(
      (col("score") > 0.5) =!= (col("label") === 1)).count()
    assert(wrong == 0, s"$wrong misclassified")
    // and with real margin, not 0.5-coin-flips
    val margins = scored
      .select(min(when(col("label") === 1, col("score"))).as("minPos"),
        max(when(col("label") === 0, col("score"))).as("maxNeg"))
      .head()
    assert(margins.getDouble(0) > 0.7 && margins.getDouble(1) < 0.3)
  }

  test("training is deterministic across runs and repartitionings") {
    val a = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = 10, lr = 5.0)
    val b = Classifier.train(planted.repartition(7), "doc_id", "text", "label",
      dim = dim, iters = 10, lr = 5.0)
    assert(a.weights.toSeq == b.weights.toSeq)
    // the driver-side small-corpus loop and the distributed treeAggregate
    // loop must be BIT-identical (exact decimal gradient sums are order-
    // insensitive): force the distributed path on the same corpus
    val c = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = 10, lr = 5.0, driverLoopMaxDocs = 0)
    assert(a.weights.toSeq == c.weights.toSeq,
      "driver-loop and treeAggregate paths diverged")
  }

  test("one gradient step matches the closed form on a two-doc corpus") {
    // doc A: "x x" label 1 → single feature i=h(x), x=1; doc B: "y" label 0.
    // From w=0: p=sigmoid(0)=0.5 for both; mean grads g(hx)=(0.5-1)/2,
    // g(hy)=0.5/2, g(bias)=((0.5-1)+(0.5-0))/2=0. Adagrad's first step per
    // touched coordinate is exactly lr·sign(g) (G=g² ⇒ g/√G=±1), and a
    // zero gradient leaves the coordinate untouched → w[hx]=+lr,
    // w[hy]=-lr, bias=0, everything else 0.
    val df = Seq((1L, "x x", 1), (2L, "y", 0)).toDF("doc_id", "text", "label")
    val m = Classifier.train(df, "doc_id", "text", "label",
      dim = dim, iters = 1, lr = 4.0)
    val hx = Seq("x").toDF("t").select(Classifier.hashIndex(col("t"), dim)).head().getInt(0)
    val hy = Seq("y").toDF("t").select(Classifier.hashIndex(col("t"), dim)).head().getInt(0)
    assert(math.abs(m.weights(hx) - 4.0) < 1e-9)
    assert(math.abs(m.weights(hy) + 4.0) < 1e-9)
    assert(math.abs(m.bias) < 1e-9)
    assert(m.weights.zipWithIndex.forall { case (w, i) =>
      i == hx || i == hy || i == dim || w == 0.0 })
  }

  test("md5Index is a stable [0,256) bucket and scoreExpr replays it") {
    val toks = Seq("the", "a", "zz", "", "école").toDF("t")
    val idx = toks.filter(col("t") =!= "")
      .select(Classifier.md5Index(col("t")).as("i")).as[Int].collect()
    assert(idx.forall(i => i >= 0 && i < 256))
    // portable-kernel score on a known doc: mean of w(idx(tok)) through
    // sigmoid, with w[j] = j/256 - 0.5
    val w = Array.tabulate(257)(j => if (j < 256) j / 256.0 - 0.5 else 0.0)
    val m = Classifier.Model(w, 256)
    val got = Seq((1L, "the a zz")).toDF("doc_id", "text")
    val s = Classifier.score(got, "doc_id", "text", m, Classifier.md5Index).head()
    val expected = {
      val zs = idx.take(3).map(i => i / 256.0 - 0.5)
      1.0 / (1.0 + math.exp(-(zs.sum / 3.0)))
    }
    assert(s.getLong(1) == 3L)
    assert(math.abs(s.getDouble(2) - expected) < 1e-12)
  }

  test("scoring plan is map-only (no exchange)") {
    val m = Classifier.Model(Array.fill(257)(0.1), 256)
    val plan = Classifier.score(planted, "doc_id", "text", m, Classifier.md5Index)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only plan:\n$plan")
  }

  test("scoreFast kernel is bit-equal to the declarative hashIndex score") {
    val dim = 1 << 8
    // deterministic pseudo-random weights incl. a nonzero bias
    val w = Array.tabulate(dim + 1)(j =>
      ((j * 2654435761L % 997).toDouble / 997.0) - 0.5)
    val m = Classifier.Model(w, dim)
    val docs = graft.ops.Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), col("text"))
      .union(Seq((900001L, "solo"), (900002L, "  double  spaces  x "),
        (900003L, "école Δδ émile")).toDF("doc_id", "text"))
    val slow = Classifier.score(docs, "doc_id", "text", m,
        Classifier.hashIndex(_, dim))
      .orderBy("doc_id").collect()
    val fast = Classifier.scoreFast(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    assert(slow.length == fast.length && slow.nonEmpty)
    slow.zip(fast).foreach { case (a, b) =>
      assert(a.getLong(1) == b.getLong(1), s"n_toks for ${a.get(0)}")
      // bit-equal, not approximately equal: same split, same xxhash64,
      // same sum order, same sigmoid
      assert(java.lang.Double.doubleToLongBits(a.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(2)),
        s"score for ${a.get(0)}: ${a.getDouble(2)} vs ${b.getDouble(2)}")
    }
    // kernel plan stays map-only too
    val plan = Classifier.scoreFast(planted, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("label riding the scoreFast projection equals the scoreFast ⋈ label self-join") {
    // round-17 q_classifier_train shape change: the final label attach is
    // a same-row projection, not a doc_id self-join of the labeled table
    // with itself. Pins row-set equality on a corpus with an empty doc
    // (dropped by scoreFast's n_toks>0 filter AND by the old inner join —
    // both sides must agree) and a unique id per row.
    val dim2 = 1 << 8
    val w = Array.tabulate(dim2 + 1)(j =>
      ((j * 48271L % 499).toDouble / 499.0) - 0.5)
    val m = Classifier.Model(w, dim2)
    val labeled = Seq(
      (0L, "alpha beta gamma", 1), (1L, "beta beta", 0),
      (2L, "", 1), (3L, "   ", 0), (4L, "zz yy xx ww vv", 1)
    ).toDF("doc_id", "text", "_y")
    val joined = Classifier.scoreFast(labeled, "doc_id", "text", m)
      .join(labeled.select(col("doc_id"), col("_y").as("label")), "doc_id")
      .select(col("doc_id"), col("label"), round(col("score"), 4).as("q_score"),
        (col("score") > 0.5).cast("int").as("pred"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val projected = labeled
      .select(col("doc_id"), col("_y").as("label"),
        graft.functions.ScoreHashed.score_hashed(col("text"), m.weights, m.dim).as("st"))
      .filter(col("st.n_toks") > 0)
      .select(col("doc_id"), col("label"), round(col("st.score"), 4).as("q_score"),
        (col("st.score") > 0.5).cast("int").as("pred"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(projected == joined)
    assert(projected.map(_.head) == Seq(0L, 1L, 4L)) // empty docs dropped by both
  }

  test("convergence gate stops early on a separable fixture, deterministically") {
    // generous cap, loose tol: the planted corpus separates and the mean
    // gradient collapses well before 400 passes
    val m = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = 400, lr = 5.0, tol = 1e-3)
    assert(m.itersRun < 400, s"gate never fired (ran ${m.itersRun})")
    assert(m.itersRun > 1)
    // deterministic: same data -> same stopping step and same weights
    val m2 = Classifier.train(planted.repartition(5), "doc_id", "text", "label",
      dim = dim, iters = 400, lr = 5.0, tol = 1e-3)
    assert(m2.itersRun == m.itersRun)
    assert(m2.weights.toSeq == m.weights.toSeq)
    // a gated run equals the ungated run truncated at the same step
    val trunc = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = m.itersRun, lr = 5.0, tol = 0.0)
    assert(trunc.weights.toSeq == m.weights.toSeq)
    // tol = 0 disables the gate entirely
    val full = Classifier.train(planted, "doc_id", "text", "label",
      dim = dim, iters = 25, lr = 5.0, tol = 0.0)
    assert(full.itersRun == 25)
  }
}
