package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class CodecsSpec extends AnyFunSuite {

  private val payload =
    ("the quick brown fox jumps over the lazy dog " * 4000).getBytes("UTF-8")

  test("detect routes the eight stream-codec magics and rejects the rest") {
    assert(Codecs.detect(Codecs.gzip(payload)) == "gzip")
    assert(Codecs.detect(Codecs.zstd(payload)) == "zstd")
    assert(Codecs.detect(Codecs.xz(payload)) == "xz")
    assert(Codecs.detect(Codecs.bzip2(payload)) == "bzip2")
    assert(Codecs.detect(Codecs.lz4(payload)) == "lz4")
    assert(Codecs.detect(Codecs.snappy(payload)) == "snappy")
    assert(Codecs.detect(Codecs.lzma(payload)) == "lzma")
    assert(Codecs.detect(Codecs.zCompress(payload)) == "z")
    assert(Codecs.detect(payload) == "none")
    assert(Codecs.detect(null) == "none")
    assert(Codecs.detect(Array[Byte](0x28, -0x4B)) == "none") // short zstd
    // lzma's weak magic must NOT fire on plausible binary noise: zero
    // dict, over-large dict, bad props, or a nonsense size high byte
    assert(Codecs.detect(Array[Byte](93, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)) == "none")
    assert(Codecs.detect(Array[Byte](93, 0, 0, 0, 0x7F, 1, 2, 3, 4, 5, 6, 7, 8)) == "none")
    assert(Codecs.detect(Array[Byte](-31, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)) == "none")
    assert(Codecs.detect(Array[Byte](93, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 9)) == "none")
  }

  test("round-trip through every arm, one-shot and chunked") {
    for (c <- Seq(Codecs.gzip(payload), Codecs.zstd(payload),
        Codecs.xz(payload), Codecs.bzip2(payload), Codecs.lz4(payload),
        Codecs.snappy(payload), Codecs.lzma(payload),
        Codecs.zCompress(payload))) {
      assert(java.util.Arrays.equals(Codecs.decompress(c), payload))
      val slabs = Codecs.chunks(c, 4096).toSeq
      assert(slabs.forall(_.length <= 4096))
      assert(java.util.Arrays.equals(slabs.toArray.flatten, payload))
    }
  }

  test(".Z fixtures exercise every byte value and the frozen-table tail") {
    // all 256 byte values + a long repetitive tail that overflows the
    // 9-bit table (nextCode hits 512 and freezes) — the decoder must
    // track the same freeze
    val b = (Array.tabulate(256)(_.toByte) ++
      Array.fill(50000)("abcab".getBytes("UTF-8")).flatten)
    assert(java.util.Arrays.equals(Codecs.decompress(Codecs.zCompress(b)), b))
    // empty input is a legal (header-only) stream
    assert(Codecs.decompress(Codecs.zCompress(Array.emptyByteArray)).isEmpty)
    // single byte
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.zCompress(Array[Byte](42))), Array[Byte](42)))
  }

  test("identity arm: uncompressed blobs pass through untouched") {
    assert(java.util.Arrays.equals(Codecs.decompress(payload), payload))
    assert(Codecs.decompress(Array.emptyByteArray).isEmpty)
    assert(Codecs.decompress(null).isEmpty)
  }

  test("concatenated frames/streams decode across the joins (the appended-shard shape)") {
    val a = "alpha line\n".getBytes("UTF-8")
    val b = "beta line\n".getBytes("UTF-8")
    val c = "gamma line\n".getBytes("UTF-8")
    val whole = a ++ b ++ c
    // multi-frame zstd (one frame per append)
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.zstdFrames(Seq(a, b, c))), whole))
    // concatenated gzip members
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.gzip(a) ++ Codecs.gzip(b) ++ Codecs.gzip(c)), whole))
    // concatenated xz streams
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.xz(a) ++ Codecs.xz(b) ++ Codecs.xz(c)), whole))
    // concatenated bzip2 streams
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.bzip2(a) ++ Codecs.bzip2(b) ++ Codecs.bzip2(c)), whole))
    // concatenated lz4 frames
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.lz4(a) ++ Codecs.lz4(b) ++ Codecs.lz4(c)), whole))
    // appended framed-snappy shards (each shard leads with its own
    // stream-identifier chunk — legal mid-stream per the framing spec)
    assert(java.util.Arrays.equals(
      Codecs.decompress(Codecs.snappy(a) ++ Codecs.snappy(b) ++ Codecs.snappy(c)), whole))
  }

  test("zstd skippable frames (seekable-zstd seek tables) are skipped") {
    // RFC 8878 §3.1.2: magic 0x184D2A50..5F + LE32 size + opaque data
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 8, 0, 0, 0) ++
      Array.fill[Byte](8)(0x7F)
    val a = "visible".getBytes("UTF-8")
    val blob = Codecs.zstd(a) ++ skip ++ Codecs.zstd(a)
    assert(new String(Codecs.decompress(blob), "UTF-8") == "visiblevisible")
  }

  test("truncated / corrupt streams cut short, never throw") {
    for (c <- Seq(Codecs.zstd(payload), Codecs.xz(payload), Codecs.bzip2(payload),
        Codecs.lz4(payload), Codecs.snappy(payload), Codecs.lzma(payload),
        Codecs.zCompress(payload))) {
      val trunc = java.util.Arrays.copyOf(c, c.length / 2)
      val got = Codecs.decompress(trunc) // prefix of payload or empty — no throw
      assert(got.length <= payload.length)
      assert(java.util.Arrays.equals(got,
        java.util.Arrays.copyOf(payload, got.length)))
      val corrupt = c.clone()
      corrupt(c.length / 2) = (corrupt(c.length / 2) ^ 0x55).toByte
      Codecs.decompress(corrupt) // must not throw
    }
  }

  test("decompress cap bounds an adversarial bomb") {
    val bomb = Codecs.zstd(new Array[Byte](32 << 20)) // 32 MiB of zeros, tiny frame
    assert(bomb.length < 64 * 1024)
    assert(Codecs.decompress(bomb, cap = 1 << 16).length == (1 << 16))
  }
}
