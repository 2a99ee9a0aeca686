package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup

/** The fused text→signature kernels must be BIT-IDENTICAL to the
  * composable HOF-shingler → minhash_signature path they replace — the
  * LSH bucket assignments (and therefore every downstream candidate set)
  * depend on exact hash equality.
  */
class MinHashTextSpec extends SparkSpec {

  private val tricky = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                       // fewer tokens than n
    "single",                    // one token
    "",                          // empty text
    "double  space between",     // empty token from consecutive spaces
    " leading and trailing ",    // empty edge tokens
    "unicode éé café naïve 你好 tokens here",
    "x " * 200 + "tail"          // long repetitive text
  )

  private def df = {
    import spark.implicits._
    tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("fused word-shingle signatures equal the composable path") {
    for (n <- Seq(2, 3); k <- Seq(8, 64)) {
      val fused = df.select(col("id"),
        MinHashText.minhash_word_shingles(col("text"), n, k).as("sig"))
      val composed = df.select(col("id"),
        MinHashSignature.minhash_signature(Dedup.WordShingles(n)("text"), k).as("sig"))
      val mismatches = fused.join(composed.withColumnRenamed("sig", "sig2"), "id")
        .filter(col("sig") =!= col("sig2"))
        .count()
      assert(mismatches == 0, s"word n=$n k=$k diverged from the HOF path")
    }
  }

  test("fused char-shingle signatures equal the composable path") {
    for (c <- Seq(3, 5); k <- Seq(8, 64)) {
      val fused = df.select(col("id"),
        MinHashText.minhash_char_shingles(col("text"), c, k).as("sig"))
      val composed = df.select(col("id"),
        MinHashSignature.minhash_signature(Dedup.CharShingles(c)("text"), k).as("sig"))
      val mismatches = fused.join(composed.withColumnRenamed("sig", "sig2"), "id")
        .filter(col("sig") =!= col("sig2"))
        .count()
      assert(mismatches == 0, s"char c=$c k=$k diverged from the HOF path")
    }
  }

  test("minHashSignatures routes standard shinglers through the fused kernel") {
    // same outputs through the public API whichever path is taken
    val viaApi = Dedup.minHashSignatures(df, "id", "text", 16, Dedup.WordShingles(3))
    val direct = df.select(col("id"),
      MinHashText.minhash_word_shingles(col("text"), 3, 16).as("sig"))
    val mismatches = viaApi.join(direct.withColumnRenamed("sig", "sig2"), "id")
      .filter(col("sig") =!= col("sig2"))
      .count()
    assert(mismatches == 0)
  }
}
