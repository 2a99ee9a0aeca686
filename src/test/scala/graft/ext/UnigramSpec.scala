package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramOps

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Seq[(String, Double)], maxLen: Int = 8) =
    UnigramOps.viterbi(word, UnigramOps.buildTable(vocab), maxLen, -20.0).toSeq

  test("viterbi picks the max-likelihood segmentation") {
    val v = Seq("ab" -> -1.0, "c" -> -1.0, "a" -> -3.0, "b" -> -3.0, "abc" -> -2.5)
    assert(seg("abc", v) == Seq("ab", "c")) // -2.0 beats single-piece -2.5
    val v2 = v.map { case ("abc", _) => "abc" -> -1.5; case x => x }
    assert(seg("abc", v2) == Seq("abc")) // -1.5 beats -2.0
  }

  test("ties prefer the longer (earlier-split) piece; unknown chars fall back") {
    assert(seg("ab", Seq("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0)) == Seq("ab"))
    // 'x' is not in the vocab: single-char unk fallback keeps totality
    assert(seg("axa", Seq("a" -> -1.0)) == Seq("a", "x", "a"))
    assert(seg("", Seq("a" -> -1.0)).isEmpty)
  }

  test("segmentation is lossless on fuzzed words and vocabularies") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val word = rnd.alphanumeric.take(1 + rnd.nextInt(14)).mkString
      val subs = for {
        _ <- 1 to 6
        s = rnd.nextInt(word.length)
        l = 1 + rnd.nextInt(math.min(4, word.length - s))
      } yield word.substring(s, s + l) -> -(1.0 + rnd.nextDouble() * 5)
      val pieces = seg(word, subs.distinctBy(_._1))
      assert(pieces.mkString == word, s"lossy: $word -> $pieces")
    }
  }

  test("codegen path agrees with the interpreted kernel") {
    val vocab = Seq("hel" -> -1.0, "lo" -> -1.2, "hello" -> -1.8, "h" -> -4.0,
      "e" -> -4.0, "l" -> -4.0, "o" -> -4.0)
    val df = Seq("hello hel lo", "ohe llo").toDF("text")
      .select(col("text"), Unigram.tokens(col("text"), vocab).as("pieces"))
    df.collect().foreach { r =>
      val expect = r.getString(0).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => seg(w, vocab))
      assert(r.getSeq[String](1) == expect.toSeq)
    }
  }

  test("training keeps whole high-frequency words as pieces, deterministically") {
    val hist = Seq(("hello", 100L), ("help", 50L), ("world", 80L))
    val v1 = Unigram.trainFromHistogram(hist, vocabSize = 40, seedSize = 200)
    val v2 = Unigram.trainFromHistogram(hist, vocabSize = 40, seedSize = 200)
    assert(v1 == v2, "training must be deterministic")
    val pieces = v1.map(_._1).toSet
    assert(pieces.contains("hello") && pieces.contains("world"),
      s"whole frequent words should survive pruning, got $pieces")
    // probabilities are a distribution over observed Viterbi counts
    assert(v1.forall(_._2 < 0.0))
  }

  test("corpus-trained model tokenizes the corpus losslessly (sampled)") {
    val docs = graft.ops.Tables.documents(spark, sfDir).limit(200)
    val vocab = Unigram.train(docs, "text", vocabSize = 300,
      maxWords = 5000, seedSize = 2000)
    val bad = docs
      .select(col("text"),
        concat_ws("", Unigram.tokens(col("text"), vocab)).as("glued"),
        regexp_replace(col("text"), "\\s+", "").as("squeezed"))
      .filter(col("glued") =!= col("squeezed"))
      .count()
    assert(bad == 0, "pieces must concatenate back to the text for every doc")
  }
}
