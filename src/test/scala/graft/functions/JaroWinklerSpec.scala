package graft.functions

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.JaroWinklerKernel.jaro_winkler

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (the Winkler paper's canonical pairs)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
  }

  test("edge cases match DuckDB semantics (the oracle engine)") {
    assert(jw("", "") == 0.0) // DuckDB scores empty-vs-empty 0, not 1
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    // window = max/2 - 1 = 0: only same-position matches
    assert(jw("ab", "ba") == 0.0)
    assert(math.abs(jw("aal", "ala") - 0.5555555555555555) < 1e-12)
  }

  test("Winkler boost applies only above the 0.7 jaro threshold") {
    // jaro = 2/3 with a 3-char common prefix: boost must NOT fire
    assert(math.abs(jw("abcdef", "abczzz") - 0.6666666666666666) < 1e-12)
    // CRATE/TRACE: jaro > 0.7 but no common prefix → unchanged
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
    // prefix capped at 4: identical 10-char prefix boosts as 4
    val j = jw("abcdefghij_X", "abcdefghij_Y")
    val jaroOnly = (11.0 / 12 + 11.0 / 12 + 1.0) / 3
    assert(math.abs(j - (jaroOnly + 4 * 0.1 * (1 - jaroOnly))) < 1e-12)
  }

  test("symmetry and range on random pairs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0, s"out of range: $a / $b -> $x")
      assert(x == jw(b, a), s"asymmetric: $a / $b")
    }
  }

  test("codegen path agrees with the interpreted kernel") {
    import spark.implicits._
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
      ("Customer#000000001", "Customer#000000002"), ("", ""), ("abc", "abc"),
      ("abcdef", "abczzz"), ("CRATE", "TRACE"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), jaro_winkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }
}
