package graft.ops

import graft.SparkSpec

/** Anchors for the round-7 analytics wave beyond the DuckDB oracle gate:
  * the sketch estimate is bounded against its exact twin, and the MERGE
  * classification is checked for internal consistency.
  */
class AnalyticsQueriesSpec extends SparkSpec {

  test("corpus MinHash sketch estimate tracks the exact 3-gram Jaccard") {
    val exact = Catalog.queries("q_corpus_overlap")(spark, sfDir)
      .select("jaccard").head().getDouble(0)
    val est = Catalog.queries("q_corpus_overlap_est")(spark, sfDir)
      .select("est_jaccard").head().getDouble(0)
    // k=128 components → σ = sqrt(J(1-J)/k) ≈ 0.044 at J≈0.5; allow 4σ
    assert(math.abs(est - exact) < 0.18,
      s"estimate $est drifted from exact $exact")
  }

  test("merge upsert: action classification is complete and consistent") {
    val r = Catalog.queries("q_merge_upsert")(spark, sfDir)
    val byAction = r.groupBy("action").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nUpd = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 7 = 0")).count()
    val nDel = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 7 = 1")).count()
    val nIns = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 11 = 0")).count()
    assert(byAction("update") == nUpd)
    assert(byAction("insert") == nIns)
    assert(byAction("keep") == nDocs - nUpd - nDel)
    assert(!byAction.contains("delete"), "deletes must not survive the merge")
  }

  test("regression slope is partitioning-invariant (exact stats)") {
    val a = Catalog.queries("q_regression")(spark, sfDir).collect()
    val b = Catalog.queries("q_regression")(spark,
      sfDir) // second plan execution — different task interleaving
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
