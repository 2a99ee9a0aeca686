package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text kernels for the quality/token scans that run
  * over the whole corpus: the composable forms
  * (`aggregate(transform(split(...)))` / `size(filter(split(...)))`)
  * evaluate higher-order lambdas interpreted and re-split the text per
  * output column — the same cost class the fused MinHash
  * ([[MinHashText]]) and language-ID ([[StopwordVotes]]) kernels
  * eliminated. Each kernel here walks the token boundaries once, with no
  * token array materialized.
  *
  * Both are semantics-identical to their composable reference forms
  * (asserted corpus-wide and property-tested in TextAnalysisSpec /
  * PropertySpec).
  */
object TextKernels {

  /** BPE-ish subword count: Σ over space-separated tokens of
    * max(ceil(charLen/divisor), 1). Token length is counted in
    * CHARACTERS (matching `length()` on the split tokens — UTF-8 aware).
    */
  def computeSubwords(text: UTF8String, divisor: Int): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    var total = 0L
    var tokChars = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        total += math.max((tokChars + divisor - 1) / divisor, 1)
        tokChars = 0
        i += 1
      } else {
        i += UTF8String.numBytesForFirstByte(bytes(i))
        tokChars += 1
      }
    }
    total + math.max((tokChars + divisor - 1) / divisor, 1)
  }

  /** Number of space-separated tokens contained in `words` (with
    * multiplicity) — the stopword-hit counter behind quality scoring.
    */
  def computeStopwordHits(text: UTF8String, words: java.util.HashSet[String]): Long = {
    val s = text.toString
    var hits = 0L
    var from = 0
    val len = s.length
    while (from <= len) {
      var to = s.indexOf(' ', from)
      if (to < 0) to = len
      if (words.contains(s.substring(from, to))) hits += 1
      from = to + 1
    }
    hits
  }

  /** Token boundaries of a single-space-separated byte string (the
    * `split(text, ' ', -1)` model: empty tokens kept): returns
    * (starts, ends, tokenCount) with ends exclusive. Shared by every
    * word-oriented kernel so the subtle boundary scan exists ONCE.
    */
  private def tokenBounds(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val len = bytes.length
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    (starts, ends, tokens)
  }

  /** Word n-grams as zero-copy byte-range slices: a token n-gram joined
    * with the single-space separator it was split on IS a contiguous
    * substring of the input (the same identity the fused MinHash kernel
    * exploits), so each output string just wraps a (offset, length) view
    * of the text's byte array. Rows with fewer than n tokens yield an
    * empty array — matching the composable form's guard.
    */
  def computeWordNgrams(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, tokens) = tokenBounds(bytes)
    if (tokens < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](tokens - n + 1)
    var s = 0
    while (s < out.length) {
      val from = starts(s)
      out(s) = UTF8String.fromBytes(bytes, from, ends(s + n - 1) - from)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Word n-shingles: like [[computeWordNgrams]] but with the shingling
    * guard — a document with fewer than n tokens yields ONE shingle (the
    * whole text), matching `Dedup.WordShingles`' composable form (and the
    * window rule of [[MinHashText.computeWords]]).
    */
  def computeWordShingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, tokens) = tokenBounds(bytes)
    val numShingles = math.max(tokens - n + 1, 1)
    val out = new Array[Any](numShingles)
    var s = 0
    while (s < numShingles) {
      val from = starts(s)
      val to = ends(math.min(s + n - 1, tokens - 1))
      out(s) = UTF8String.fromBytes(bytes, from, to - from)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Char k-shingles (UTF-8 aware: a window of k CHARACTERS is still a
    * contiguous byte range), whole text as the single shingle when
    * shorter than k chars — matching `Dedup.CharShingles`' composable
    * form and [[MinHashText.computeChars]].
    */
  def computeCharShingles(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var chars = 0
    var i = 0
    while (i < len) { i += UTF8String.numBytesForFirstByte(bytes(i)); chars += 1 }
    val starts = new Array[Int](chars + 1)
    var ci = 0
    i = 0
    while (i < len) {
      starts(ci) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      ci += 1
    }
    starts(chars) = len
    val numShingles = math.max(chars - k + 1, 1)
    val out = new Array[Any](numShingles)
    var s = 0
    while (s < numShingles) {
      val from = if (chars == 0) 0 else starts(s)
      val to = starts(math.min(s + k, chars))
      out(s) = UTF8String.fromBytes(bytes, from, to - from)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Overlapping token windows (context-window chunking): window w at
    * stride s over the tokens — each chunk is the byte range from token
    * (k·s)'s start to token (k·s + w - 1)'s end. Matches the composable
    * `transform(sequence(1, greatest(tokens - w + 1, 1), s), i ->
    * array_join(slice(toks, i, w), ' '))` form: at least one window, the
    * last window clamped to the end.
    */
  def computeChunks(text: UTF8String, window: Int, stride: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val (starts, ends, tokens) = tokenBounds(bytes)
    val span = math.max(tokens - window + 1, 1)
    val numChunks = (span + stride - 1) / stride
    val out = new Array[Any](numChunks)
    var k = 0
    while (k < numChunks) {
      val first = k * stride
      val from = starts(first)
      val to = ends(math.min(first + window - 1, tokens - 1))
      out(k) = UTF8String.fromBytes(bytes, from, to - from)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def subword_count(text: Column, divisor: Int): Column =
    Bridge.column(SubwordCount(Bridge.expression(text), divisor))

  def stopword_count(text: Column, words: Seq[String]): Column =
    Bridge.column(StopwordCount(Bridge.expression(text), words))

  def word_ngrams(text: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(text), n))

  def word_shingles(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))

  def char_shingles(text: Column, k: Int): Column =
    Bridge.column(CharShinglesExpr(Bridge.expression(text), k))

  def chunk_windows(text: Column, window: Int, stride: Int): Column =
    Bridge.column(ChunkWindows(Bridge.expression(text), window, stride))
}

case class SubwordCount(child: Expression, divisor: Int) extends UnaryExpression {
  require(divisor >= 1, s"subword_count: divisor must be >= 1, got $divisor")
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeSubwords(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.computeSubwords($c, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeWordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.computeWordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_shingles: n must be >= 1, got $n")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeWordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.computeWordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_shingles: k must be >= 1, got $k")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeCharShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cIn =>
      s"${ev.value} = graft.functions.TextKernels.computeCharShingles($cIn, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ChunkWindows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window >= 1 && stride >= 1,
    s"chunk_windows: window and stride must be >= 1, got ($window, $stride)")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "chunk_windows"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeChunks(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.computeChunks($c, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StopwordCount(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_count"

  override def nullSafeEval(input: Any): Any =
    TextKernels.computeStopwordHits(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.computeStopwordHits($c, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
