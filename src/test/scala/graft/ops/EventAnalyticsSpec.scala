package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Anchors for the event-analytics wave beyond the DuckDB oracle gate. */
class EventAnalyticsSpec extends SparkSpec {

  test("negative edges: label partition is sound and deterministic") {
    val r = Catalog.queries("q_negative_edges")(spark, sfDir).cache()
    val edges = r.filter(col("label") === 1).select("src", "dst")
    val negs = r.filter(col("label") === 0).select("src", "dst")
    // no negative is a real edge
    assert(negs.join(edges, Seq("src", "dst"), "left_semi").isEmpty,
      "a sampled negative must not exist in the edge set")
    assert(negs.count() > 0, "sampling must produce negatives")
    // deterministic across runs
    val r2 = Catalog.queries("q_negative_edges")(spark, sfDir)
    assert(r.collect().map(_.toString).toSeq ==
      r2.collect().map(_.toString).toSeq)
    r.unpersist()
  }

  test("funnel stages are monotone: converters at stage n+1 converted at n") {
    val f = Catalog.queries("q_funnel")(spark, sfDir)
    val bad = f.filter(col("mp") =!= -1 && col("mc") === -1)
    assert(bad.isEmpty, "a purchase-converter must have a qualifying click")
    // stage timestamps are ordered where present
    val disorder = f.filter(col("mc") =!= -1 && col("mc") < col("mv"))
      .union(f.filter(col("mp") =!= -1 && col("mp") < col("mc")))
    assert(disorder.isEmpty)
  }

  test("resample: filled series has no gaps and carries values forward") {
    val r = Catalog.queries("q_resample")(spark, sfDir)
    // per user, row count == span (h1-h0+1): no missing spine hours
    val spans = r.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("h") - min("h") + 1).as("span"))
      .filter(col("n") =!= col("span"))
    assert(spans.isEmpty, "spine must be gap-free")
    // v_fill never null from the first observation on (first row observed)
    assert(r.filter(col("v_fill").isNull).isEmpty)
  }
}
