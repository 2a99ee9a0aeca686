package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The tokenizer write-once/reload lifecycle: a reloaded model must be
  * EXACTLY the trained one (order included — BPE merge rank is apply
  * order), and serving with the reloaded model must reproduce the same
  * tokens.
  */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq("low lower lowest slow slower glow glowing")
    .toDF("text")

  test("BPE merges round-trip through the catalog, serve-identical") {
    val merges = Bpe.train(corpus, "text", numMerges = 12)
    TokenizerStore.writeBpe(spark, merges, "tok_store_bpe")
    val reloaded = TokenizerStore.loadBpe(spark, "tok_store_bpe")
    assert(reloaded == merges, "merge list (and its order) must survive")
    val a = corpus.select(Bpe.tokens(col("text"), merges)).head().getSeq[String](0)
    val b = corpus.select(Bpe.tokens(col("text"), reloaded)).head().getSeq[String](0)
    assert(a == b)
  }

  test("WordPiece vocab round-trips, serve-identical") {
    val vocab = WordPiece.train(corpus, "text", numMerges = 12)
    TokenizerStore.writeWordPiece(spark, vocab, "tok_store_wp")
    val reloaded = TokenizerStore.loadWordPiece(spark, "tok_store_wp")
    assert(reloaded == vocab)
    val st = graft.functions.WordPieceOps
    assert(st.segment("lowest", vocab.toSet) == st.segment("lowest", reloaded.toSet))
  }

  test("qualified db.tbl names resolve the real managed location on reset") {
    // the managed path of db.tbl is <wh>/db.db/tbl, not <wh>/db.tbl — a
    // naive name→path join would miss it, leave the stale directory, and
    // the second write would die with LOCATION_ALREADY_EXISTS
    spark.sql("CREATE DATABASE IF NOT EXISTS tokstore_db")
    val merges = Bpe.train(corpus, "text", numMerges = 6)
    TokenizerStore.writeBpe(spark, merges, "tokstore_db.bpe_q")
    // overwrite again (exercises reset with an EXISTING catalog entry,
    // catalog-resolved location)
    TokenizerStore.writeBpe(spark, merges, "tokstore_db.bpe_q")
    assert(TokenizerStore.loadBpe(spark, "tokstore_db.bpe_q") == merges)
    // stale-location case: drop the entry but leave the directory, then
    // write again — reset must clear the derived db.db/tbl path
    val loc = spark.sql("DESCRIBE TABLE EXTENDED tokstore_db.bpe_q")
      .filter(col("col_name") === "Location")
      .select("data_type").head().getString(0)
    spark.sql("DROP TABLE tokstore_db.bpe_q")
    val dir = new java.io.File(new java.net.URI(loc).getPath)
    dir.mkdirs()
    new java.io.FileOutputStream(new java.io.File(dir, "stale")).close()
    TokenizerStore.writeBpe(spark, merges, "tokstore_db.bpe_q")
    assert(TokenizerStore.loadBpe(spark, "tokstore_db.bpe_q") == merges)
  }

  test("Unigram piece table round-trips bit-exactly (log probs included)") {
    val pieces = Unigram.train(corpus, "text", vocabSize = 24)
    TokenizerStore.writeUnigram(spark, pieces, "tok_store_uni")
    val reloaded = TokenizerStore.loadUnigram(spark, "tok_store_uni")
    assert(reloaded.map(_._1) == pieces.map(_._1))
    // doubles survive parquet bit-exactly
    assert(reloaded.map(_._2.doubleValue) == pieces.map(_._2.doubleValue))
  }
}
