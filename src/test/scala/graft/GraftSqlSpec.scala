package graft

import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {

  test("bootstrap registers tables and custom SQL functions") {
    GraftSql.bootstrap(spark, sfDir)
    val n = spark.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(n > 0)
    // custom Catalyst expression callable from SQL
    val self = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS c,
                dot_product(embedding, embedding) AS d
         FROM embeddings LIMIT 5""").collect()
    assert(self.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(self.forall(_.getDouble(2) > 0.0))
  }

  test("stable split fractions are plausible and deterministic") {
    GraftSql.bootstrap(spark, sfDir)
    val splits = ops.Tables.documents(spark, sfDir)
      .withColumn("split", ext.TextAnalysis.stableSplit(col("doc_id")))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("val") > splits("test"))
    // re-partitioned input produces the identical assignment
    val again = ops.Tables.documents(spark, sfDir).repartition(13)
      .withColumn("split", ext.TextAnalysis.stableSplit(col("doc_id")))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits == again)
  }
}
