package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BpeOps

/** Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * missing piece between the corpus and a token budget: train the merge
  * table ON the corpus the engine curates, then tokenize with a
  * codegen'd scan.
  *
  * The distributed shape is the standard one (what tokenizer trainers do
  * at corpus scale): the CORPUS-sized work — word counting — is one
  * map-side-combined aggregation; the merge loop then runs driver-side
  * over the compact word HISTOGRAM (vocabulary-sized, not corpus-sized —
  * merging a pair across a 100 TB corpus and across its word histogram
  * are the same computation, because BPE statistics are per-word-type ×
  * frequency). The trained merge list is a model artifact
  * ([[graft.functions.BpeTokens]] ships it into one codegen'd
  * tokenization scan), exactly the train-once-serve-many pattern of the
  * vector quantizers.
  */
object Bpe {

  /** Corpus word histogram — the BPE training input and the only
    * corpus-sized computation (one shuffle to `word` groups, map-side
    * combined).
    */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Classic BPE merge training over a (word, count) histogram:
    * `numMerges` rounds of "merge the most frequent adjacent symbol
    * pair". Deterministic: ties break to the lexicographically smallest
    * pair; pairs must occur at least `minPairCount` times (2 by default —
    * a merge seen once generalizes to nothing).
    */
  def trainMerges(
      hist: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    // words as mutable symbol arrays with their corpus counts
    val words = hist.map { case (w, c) =>
      val cps = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        cps += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (cps, c)
    }.toArray
    val merges = new scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      var best: (String, String) = null
      var bestN = minPairCount - 1
      pairCounts.foreach { case (pair, n) =>
        val better = n > bestN || (n == bestN && best != null && {
          val c1 = pair._1.compareTo(best._1)
          c1 < 0 || (c1 == 0 && pair._2.compareTo(best._2) < 0)
        })
        if (better) { best = pair; bestN = n }
      }
      if (best == null) return merges.toSeq
      merges += best
      words.foreach { case (syms, _) =>
        var j = 0
        while (j < syms.length - 1) {
          if (syms(j) == best._1 && syms(j + 1) == best._2) {
            syms(j) = best._1 + best._2
            syms.remove(j + 1)
          } else j += 1
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Train merges from a corpus: distributed histogram, truncated to the
    * `maxWords` most frequent word types (deterministic (n desc, word)
    * order — rare-tail types contribute ~nothing to pair statistics),
    * then the driver-side merge loop.
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    val hist = wordHistogram(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainMerges(hist.toSeq, numMerges)
  }

  /** Tokenize: every whitespace word's BPE pieces in order — a map-only
    * codegen'd scan with the merge table resident ([[BpeOps]]).
    */
  def tokens(text: org.apache.spark.sql.Column, merges: Seq[(String, String)]) =
    BpeOps.bpe_tokens(text, merges)

  /** The trained model as a DataFrame — (rank, left, right, merged) —
    * for a write-once artifact table beside the corpus it tokenizes.
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b, a + b) }
      .toDF("rank", "left", "right", "merged")
  }
}
