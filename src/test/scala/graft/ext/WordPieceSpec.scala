package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.WordPieceOps

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("trainVocab learns the shared stem as a continuation merge") {
    // 'low' x10, 'lower' x4, 'lowest' x3: 'l ##o' / '##o ##w' chains are
    // the high-likelihood merges; the stem assembles within a few rounds
    val hist = Seq(("low", 10L), ("lower", 4L), ("lowest", 3L))
    val vocab = WordPiece.trainVocab(hist, numMerges = 8, minPairCount = 2)
    // base vocab: every positional char piece
    assert(vocab.contains("l") && vocab.contains("##o") && vocab.contains("##w"))
    // some multi-char merged piece exists and merges never cross word start
    assert(vocab.exists(p => p.length > 2 && p.startsWith("##")) ||
      vocab.exists(p => p.length > 1 && !p.startsWith("##")))
    assert(!vocab.exists(_.startsWith("####")))
    // deterministic
    assert(vocab == WordPiece.trainVocab(hist, numMerges = 8, minPairCount = 2))
  }

  test("greedy segmentation is longest-match-first with ## continuations") {
    val vocab = Set("un", "##aff", "##able", "##ff", "##a", "u", "##n",
      "affable", "aff")
    assert(WordPieceOps.segment("unaffable", vocab) == Seq("un", "##aff", "##able"))
    // word-initial piece must NOT use a ##-form
    assert(WordPieceOps.segment("affable", vocab) == Seq("affable"))
    // uncoverable word → [UNK]
    assert(WordPieceOps.segment("zzz", vocab) == Seq("[UNK]"))
    assert(WordPieceOps.segment("", vocab) == Seq.empty)
  }

  test("segmentation round-trips: stripping ## reassembles the word") {
    val corpus = Seq("low lower lowest slow slower glow").toDF("text")
    val vocab = WordPiece.train(corpus, "text", numMerges = 16)
    val vset = vocab.toSet
    for (w <- Seq("low", "lower", "lowest", "slow", "slower", "glow", "lowers")) {
      val pieces = WordPieceOps.segment(w, vset)
      if (pieces != Seq("[UNK]"))
        assert(pieces.map(_.stripPrefix("##")).mkString == w, s"word=$w pieces=$pieces")
    }
  }

  test("computeStats matches per-word segment() accounting") {
    val vocab = Set("ab", "##cd", "x")
    val vset = new java.util.HashSet[String]()
    vocab.foreach(vset.add)
    val r = WordPieceOps.computeStats(UTF8String.fromString("abcd x zz abcd"), vset)
    // abcd → [ab, ##cd] (2), x → [x] (1), zz → [UNK] (1+unk)
    assert(r.getLong(0) == 2 + 1 + 1 + 2)
    assert(r.getLong(1) == 1)
  }

  test("corpus-trained vocab tokenizes the corpus with zero UNKs (sampled)") {
    val docs = graft.ops.Tables.documents(spark, sfDir).limit(50)
    val vocab = WordPiece.train(docs, "text", numMerges = 32)
    val stats = docs.select(
        WordPieceOps.wordpiece_stats(col("text"), vocab).as("st"))
      .select(col("st.n_pieces").as("p"), col("st.n_unk").as("u"))
      .agg(sum("p"), sum("u")).head()
    assert(stats.getLong(0) > 0)
    // every char of the corpus is in the base vocab → no UNK possible
    assert(stats.getLong(1) == 0L)
  }

  test("serve-time word boundary is exactly the train-time \\s class") {
    // U+2028 LINE SEPARATOR: Character.isWhitespace=true but Java-regex
    // default \s=false. Training (split on \\s+) sees ONE word
    // "foo<U+2028>bar"; the serve kernel must too — an isWhitespace-based
    // splitter would cut it into foo|bar and (with this vocab) emit two
    // pieces where training vocabulary assumed one.
    assert(!WordPieceOps.isWordBreak('\u2028'))
    assert(!WordPieceOps.isWordBreak('\u2029'))
    assert(!WordPieceOps.isWordBreak('\u001C')) // FS: isWhitespace=true, \s=false
    for (c <- " \t\n\u000B\f\r") assert(WordPieceOps.isWordBreak(c))
    val vset = new java.util.HashSet[String]()
    Seq("foo\u2028bar", "foo", "bar", "##bar").foreach(vset.add)
    val r = WordPieceOps.computeStats(UTF8String.fromString("foo\u2028bar"), vset)
    assert(r.getLong(0) == 1L, "one word, one whole-word piece")
    assert(r.getLong(1) == 0L)
  }
}
