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

  test("audio_fingerprint is callable from SQL; NULL on undecodable bytes") {
    GraftSql.bootstrap(spark, sfDir)
    import spark.implicits._
    val target = 0x0123456789ABCDEFL
    val rows = Seq(
      (1L, ext.AudioFp.wavPcm16(ext.AudioFp.synthSamples(target))),
      (2L, ext.Flac.encode(Array(ext.AudioFp.synthSamples(target)),
        8000, 16, 256, ext.Flac.Verbatim)),
      (3L, "not audio".getBytes("UTF-8")))
      .toDF("id", "payload")
    rows.createOrReplaceTempView("audio_fp_spec")
    val out = spark.sql(
      """SELECT id, audio_fingerprint(payload) AS fp
         FROM audio_fp_spec ORDER BY id""").collect()
    assert(out(0).getLong(1) == target)       // WAV
    assert(out(1).getLong(1) == target)       // FLAC, cross-codec equal
    assert(out(2).isNullAt(1))                // undecodable → NULL
    // column API parity
    val viaApi = rows.select(col("id"),
      functions.AudioFingerprint.audio_fingerprint(col("payload")).as("fp"))
      .orderBy("id").collect()
    assert(viaApi(0).getLong(1) == target && viaApi(2).isNullAt(1))
  }

  test("fused minhash functions are callable from SQL and match the column API") {
    GraftSql.bootstrap(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_word_shingles(text, 3, 16) AS sw,
                minhash_char_shingles(text, 5, 16) AS sc
         FROM documents ORDER BY doc_id LIMIT 20""").collect()
    val viaApi = ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        functions.MinHashText.minhash_word_shingles(col("text"), 3, 16).as("sw"),
        functions.MinHashText.minhash_char_shingles(col("text"), 5, 16).as("sc"))
      .orderBy("doc_id").limit(20).collect()
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getSeq[Long](1) == b.getSeq[Long](1))
      assert(a.getSeq[Long](2) == b.getSeq[Long](2))
    }
    // non-literal size parameter is rejected with intent
    val err = intercept[Exception](
      spark.sql("SELECT minhash_word_shingles(text, CAST(doc_id AS INT), 16) FROM documents")
        .collect())
    assert(err.getMessage.contains("integer literal"))
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
