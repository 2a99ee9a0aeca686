package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class MultiMatchSpec extends AnyFunSuite {

  private def count(text: String, terms: String*): Long =
    new AhoCorasick(terms).matchedCount(UTF8String.fromString(text))

  test("distinct-term semantics: repeats count once") {
    assert(count("aaa bbb aaa", "aaa", "bbb", "ccc") == 2L)
  }

  test("overlapping and nested patterns all fire") {
    // "she" contains "he"; "hers" shares the automaton path
    assert(count("ushers", "she", "he", "hers") == 3L)
  }

  test("cross-word phrases match as substrings, not tokens") {
    assert(count("big red dog", "g r", "red dog", "dogs") == 2L)
  }

  test("utf-8 multibyte patterns are exact") {
    assert(count("caffè niño caffè", "caffè", "niño", "è n") == 3L)
    assert(count("caffe", "caffè") == 0L, "no partial-codepoint false positive")
  }

  test("agrees with contains() on randomized corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcΔé "
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val terms = (1 to 20).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val ac = new AhoCorasick(terms)
    for (_ <- 1 to 500) {
      val text = randStr(rnd.nextInt(60))
      val expected = terms.count(text.contains(_)).toLong
      assert(ac.matchedCount(UTF8String.fromString(text)) == expected,
        s"text='$text' terms=$terms")
    }
  }

  test("early exit: full-coverage text still reports every term once") {
    val terms = (0 until 70).map(i => s"t$i ")
    val text = terms.mkString
    assert(new AhoCorasick(terms).matchedCount(UTF8String.fromString(text)) == 70L,
      "HashSet path (>64 terms) counts all")
  }

  test("empty terms fail at plan construction, not at first executor eval") {
    // the transient lazy automaton would otherwise surface this as a
    // confusing mid-query task failure
    import org.apache.spark.sql.functions.lit
    intercept[IllegalArgumentException] {
      MultiMatch.multi_match_count(lit("text"), Seq("ok", ""))
    }
    intercept[IllegalArgumentException] {
      MultiMatch.multi_match_count(lit("text"), Seq.empty)
    }
  }
}
