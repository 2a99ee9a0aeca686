package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeOps
import graft.ops.Tables

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge training reproduces the textbook example, in order") {
    // the standard worked example (Sennrich'16 / HF tokenizer course
    // shape): pair counts (u,g)=20 > (p,u)=17 > (u,n)=16 > (h,u)=15 →
    // after (u,g) merges, (u,n)=16 wins round 2, then (h,ug)=15
    val hist = Seq[(String, Long)](
      ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))
    val merges = Bpe.trainMerges(hist, numMerges = 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")), s"got $merges")
    val ranks = BpeOps.buildRanks(merges)
    assert(BpeOps.encodeWord("hugs", ranks).toSeq == Seq("hug", "s"))
    assert(BpeOps.encodeWord("bun", ranks).toSeq == Seq("b", "un"))
    assert(BpeOps.encodeWord("mug", ranks).toSeq == Seq("m", "ug")) // unseen word
    assert(BpeOps.encodeWord("pun", ranks).toSeq == Seq("p", "un"))
  }

  test("training is deterministic and order-independent") {
    val hist = Seq[(String, Long)](
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L), ("lowest", 4L))
    val a = Bpe.trainMerges(hist, numMerges = 8)
    val b = Bpe.trainMerges(scala.util.Random.shuffle(hist), numMerges = 8)
    assert(a == b, s"$a vs $b")
    assert(a.nonEmpty && a.size <= 8)
  }

  test("no merge is learned below minPairCount") {
    // every adjacent pair occurs exactly once -> nothing generalizes
    val merges = Bpe.trainMerges(Seq(("abc", 1L), ("def", 1L)), numMerges = 5)
    assert(merges.isEmpty, s"got $merges")
  }

  test("segmentation is lossless: pieces concatenate back to the text") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val merges = Bpe.train(docs, "text", numMerges = 64, maxWords = 10000)
    assert(merges.nonEmpty)
    // every doc: concat of pieces == text with whitespace removed
    val bad = docs
      .select(col("doc_id"),
        concat_ws("", Bpe.tokens(col("text"), merges)).as("glued"),
        regexp_replace(col("text"), "\\s+", "").as("stripped"))
      .filter(col("glued") =!= col("stripped"))
      .count()
    assert(bad == 0L)
    // and merging strictly compresses: pieces <= characters, >= words
    val row = docs
      .select(
        sum(size(Bpe.tokens(col("text"), merges))).as("pieces"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"),
        sum(size(filter(split(col("text"), "\\s+"), w => w =!= ""))).as("words"))
      .head()
    val (pieces, chars, words) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(pieces < chars, s"BPE should compress: $pieces pieces vs $chars chars")
    assert(pieces >= words, s"pieces $pieces can never undercut whole words $words")
  }

  test("unicode robustness: surrogate pairs and random text round-trip") {
    val rnd = new scala.util.Random(7L)
    val alphabet = "ab cdé中😀" // includes an emoji surrogate pair
    val texts = (0 until 50).map { i =>
      (i.toLong, (0 until 30).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    // NOTE: mkString over chars can split a surrogate pair — exercise
    // the encoder against even malformed sequences: it must not throw
    // and must round-trip whatever it was given
    val df = texts.toDF("id", "text")
    val merges = Bpe.train(df, "text", numMerges = 16, maxWords = 1000)
    val bad = df
      .select(
        concat_ws("", Bpe.tokens(col("text"), merges)).as("glued"),
        regexp_replace(col("text"), "\\s+", "").as("stripped"))
      .filter(col("glued") =!= col("stripped"))
      .count()
    assert(bad == 0L)
  }

  test("tokenization scan is map-only with the model as a plan reference") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val merges = Seq(("t", "h"), ("th", "e"))
    val plan = docs.select(col("doc_id"), Bpe.tokens(col("text"), merges))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenization must be map-only:\n$plan")
  }
}
