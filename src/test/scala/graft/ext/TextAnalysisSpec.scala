package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language id votes by stopwords") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "le chat est dans la maison et les oiseaux"),
      (3L, "der hund und die katze das ist ein haus"),
      (4L, "el perro y la casa de los gatos es grande")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "fr")
    assert(got(3L) == "de")
    assert(got(4L) == "es")
  }

  test("token counting: whitespace + subword proxy") {
    val df = Seq(("a bb ccc dddd eeeeeeee", 5L)).toDF("text", "expected")
    val row = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordCount(col("text")).as("s")).head()
    assert(row.getLong(0) == 5L)
    // ceil(1/4)=1, 1, 1, 1, ceil(8/4)=2 → 6
    assert(row.getLong(1) == 6L)
  }

  test("quality features are bounded and deterministic") {
    val df = Seq((1L, "the data is big and the model is nice today ok")).toDF("doc_id", "text")
    val row = TextAnalysis.qualityFeatures(df, "text").head()
    val score = row.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
    assert(row.getAs[Double]("stopword_ratio") > 0.0)
  }

  test("rolling hash is order-sensitive; bag hash is not") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha")
    ).toDF("id", "text")
    val rh = df.select(col("id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) != rh(2L))
    val same = df.select(TextAnalysis.rollingHash(col("text")).as("h"))
      .union(df.select(TextAnalysis.rollingHash(col("text")).as("h")))
    assert(same.distinct().count() == 2) // stable across evaluations
  }

  test("fingerprints: md5 matches reference value") {
    val df = Seq("hello world").toDF("text")
    val fp = df.select(TextAnalysis.fingerprintMd5(col("text"))).head().getString(0)
    assert(fp == "5eb63bbbe01eeed093cb22bb8f5acdc3") // well-known md5
  }

  test("redact scrubs emails, urls and long digit runs; leaves clean text alone") {
    val df = Seq(
      (1L, "mail me at a.user+x@sub.example.org today"),
      (2L, "see https://ex.org/a?b=c#d and http://plain.io/x for docs"),
      (3L, "card 123456789012 pin 12345 year 2024 ok 1234"),
      (4L, "perfectly clean text with no secrets")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at <EMAIL> today")
    assert(got(2L) == "see <URL> and <URL> for docs")
    assert(got(3L) == "card <NUM> pin <NUM> year 2024 ok 1234") // <5 digits kept
    assert(got(4L) == "perfectly clean text with no secrets")
  }

  test("decontaminate flags only docs sharing an n-gram with the eval set") {
    val evalSet = Seq("the quick brown fox jumps over the lazy dog tonight")
      .toDF("text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox jumps over the lazy dog suffix"), // shares 8-grams
      (2L, "completely unrelated content about database systems and storage"),
      (3L, "short doc") // fewer than 8 tokens → no grams, never flagged
    ).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(corpus, "doc_id", "text", evalSet, "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(1L)._1 > 0)
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
    assert(got.size == 3) // every corpus doc present, flagged or not
  }
}
