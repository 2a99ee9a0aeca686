package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramOps

/** Unigram-LM tokenizer training (Kudo, "Subword Regularization", ACL
  * 2018 — the SentencePiece `unigram` model): the OTHER tokenizer family
  * next to [[Bpe]]. Where BPE grows a vocabulary bottom-up by merging,
  * unigram starts from an over-complete seed vocabulary and PRUNES it
  * under a probabilistic model, re-estimating piece probabilities by EM;
  * segmentation at serve time is the Viterbi max-likelihood split
  * ([[graft.functions.UnigramOps]], codegen'd).
  *
  * Distributed shape (same division of labor as [[Bpe]], and as real
  * tokenizer trainers): the corpus-sized computation is the word
  * histogram — one map-side-combined aggregation; everything after runs
  * driver-side over the capped histogram (vocabulary-sized: unigram
  * statistics are per word TYPE × frequency, so a 100 TB corpus and its
  * histogram train the identical model). Hard-EM (Viterbi counts) is
  * used for the E-step — the standard practical simplification; with the
  * seed built from substring frequencies the fixpoint is deterministic:
  * ties in the DP and in pruning break lexicographically.
  */
object Unigram {

  /** Train a unigram piece table: (piece, logProb), `vocabSize` entries
    * (plus whatever single characters are needed for closure).
    *
    * @param maxWords    histogram cap (most frequent word types train the
    *                    model; the rare tail contributes ~nothing)
    * @param maxPieceLen longest candidate substring
    * @param seedSize    over-complete seed vocabulary size before pruning
    * @param emRounds    hard-EM rounds between prune steps
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxWords: Int = 100000,
      maxPieceLen: Int = 8,
      seedSize: Int = 20000,
      emRounds: Int = 2): Seq[(String, Double)] = {
    val hist = Bpe.wordHistogram(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromHistogram(hist, vocabSize, maxPieceLen, seedSize, emRounds)
  }

  def trainFromHistogram(
      hist: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 8,
      seedSize: Int = 20000,
      emRounds: Int = 2): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    // ---- seed: substring frequencies over word types (weighted by count)
    val subFreq = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      var l = 1
      while (l <= math.min(maxPieceLen, w.length)) {
        var s = 0
        while (s + l <= w.length) {
          val piece = w.substring(s, s + l)
          subFreq.update(piece, subFreq.getOrElse(piece, 0L) + c)
          s += 1
        }
        l += 1
      }
    }
    val chars: Set[String] = subFreq.keysIterator.filter(_.length == 1).toSet
    // over-complete seed: most frequent substrings (freq·len favors the
    // longer pieces that actually compress), chars always in
    val seed: Seq[String] = {
      val multi = subFreq.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, f) => (-f * p.length, p) }
        .take(math.max(seedSize - chars.size, 0)).map(_._1)
      (chars.toSeq.sorted ++ multi).distinct
    }
    // ---- init: probs proportional to seed substring frequency
    var vocab: Map[String, Double] = {
      val total = seed.iterator.map(subFreq(_)).sum.toDouble
      seed.map(p => p -> math.log(subFreq(p) / total)).toMap
    }
    def emStep(v: Map[String, Double]): Map[String, Double] = {
      val table = UnigramOps.buildTable(v.toSeq)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, c) =>
        UnigramOps.viterbi(w, table, maxPieceLen, -20.0).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
      }
      val total = math.max(counts.valuesIterator.sum, 1L).toDouble
      // pieces the Viterbi never uses die (prob 0) — except single chars,
      // which stay at a floor for closure
      v.keysIterator.map { p =>
        val c = counts.getOrElse(p, 0L)
        val lp =
          if (c > 0L) math.log(c / total)
          else if (p.length == 1) math.log(0.5 / total)
          else Double.NegativeInfinity
        p -> lp
      }.filter(_._2 > Double.NegativeInfinity).toMap
    }
    for (_ <- 0 until emRounds) vocab = emStep(vocab)
    // ---- prune to the target size (keep all chars), then one final EM
    // round so the shipped probabilities reflect the pruned vocabulary
    val kept = vocab.toSeq
      .sortBy { case (p, lp) => (if (p.length == 1) 0 else 1, -lp, p) }
      .take(math.max(vocabSize, chars.size))
      .map(_._1).toSet
    vocab = emStep(vocab.filter { case (p, _) => kept(p) })
    vocab.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /** Tokenize: every whitespace word's max-likelihood pieces, in order —
    * a map-only codegen'd scan with the piece table resident.
    */
  def tokens(text: org.apache.spark.sql.Column, vocab: Seq[(String, Double)],
      maxPieceLen: Int = 8): org.apache.spark.sql.Column =
    UnigramOps.unigram_tokens(text, vocab, maxPieceLen)

  /** The trained model as a DataFrame — (rank, piece, log_prob) — the
    * write-once artifact table beside the corpus it tokenizes.
    */
  def vocabDf(spark: SparkSession, vocab: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex
      .map { case ((p, lp), i) => (i, p, lp) }
      .toDF("rank", "piece", "log_prob")
  }
}
