package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class TarSpec extends AnyFunSuite {

  private def sample(gz: Boolean) = Tar.build(Seq(
    ("d/", Array.emptyByteArray, '5'),
    ("d/a.txt", "file contents here".getBytes, '0'),
    ("b.bin", Array.tabulate[Byte](700)(i => (i % 127).toByte), '0')), gzip = gz)

  test("member walk: names, types, sizes, data offsets (plain and gz)") {
    for (gz <- Seq(false, true)) {
      val es = Tar.entries(sample(gz))
      assert(es.map(_.name) == Seq("d/", "d/a.txt", "b.bin"))
      assert(es.map(_.typeflag) == Seq('5', '0', '0'))
      assert(es.map(_.size) == Seq(0L, 18L, 700L))
      assert(new String(Tar.read(sample(gz), "d/a.txt").get) == "file contents here")
      assert(Tar.read(sample(gz), "b.bin").get.length == 700)
      // directories and missing names read as None
      assert(Tar.read(sample(gz), "d/").isEmpty)
      assert(Tar.read(sample(gz), "nope").isEmpty)
    }
  }

  test("extract: one pass equals entries + read per name (plain and gz)") {
    for (gz <- Seq(false, true)) {
      val t = sample(gz)
      val (es, got) = Tar.extract(t, Set("d/a.txt", "b.bin", "d/", "nope"))
      assert(es == Tar.entries(t))
      // same bytes as per-name read; dirs and missing names absent
      assert(got.keySet == Set("d/a.txt", "b.bin"))
      assert(got("d/a.txt").sameElements(Tar.read(t, "d/a.txt").get))
      assert(got("b.bin").sameElements(Tar.read(t, "b.bin").get))
    }
    // last-complete-occurrence-wins parity with read on duplicate names
    val dup = Tar.build(Seq(
      ("x.txt", "old".getBytes, '0'),
      ("x.txt", "newer".getBytes, '0')))
    assert(new String(Tar.extract(dup, Set("x.txt"))._2("x.txt")) == "newer")
    assert(new String(Tar.read(dup, "x.txt").get) == "newer")
  }

  test("ustar prefix field extends the name") {
    val t = sample(false).clone()
    // plant a prefix on the second member's header (offset 512)
    System.arraycopy("deep/tree".getBytes, 0, t, 512 + 345, 9)
    // checksum now wrong → walk stops after the first member
    assert(Tar.entries(t).map(_.name) == Seq("d/"))
  }

  test("corrupt checksum ends the walk at the last good member") {
    val t = sample(false).clone()
    t(512 + 100) = '7' // mode byte of member 2 changes, checksum stale
    assert(Tar.entries(t).map(_.name) == Seq("d/"))
  }

  test("junk, truncations and non-tar payloads: Nil/None, never thrown") {
    assert(Tar.entries(null).isEmpty)
    assert(Tar.entries("way too short".getBytes).isEmpty)
    val full = sample(false)
    var i = 0
    while (i <= full.length) {
      Tar.entries(full.take(i))
      i += 97
    }
    val gzFull = sample(true)
    i = 0
    while (i <= gzFull.length) {
      Tar.entries(gzFull.take(i)) // truncated gzip must not throw
      i += 31
    }
  }

  test("tar.gz soak: >2 GiB inflated walks and extracts in bounded heap") {
    // 40 members x 60 MiB zero-filled = ~2.35 GiB inflated, ~2.4 MB
    // compressed — written straight through GZIPOutputStream so the
    // inflated archive never exists as one array at build time either.
    // The pre-round-11 whole-blob gunzipIfNeeded dies here with
    // OutOfMemoryError("Requested array size exceeds VM limit"); the
    // streaming walk lists all members and extracts one with at most a
    // single 60 MiB member in flight.
    val memberLen = 60 * 1024 * 1024
    val zeros = new Array[Byte](memberLen)
    val n = 40
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos, 64 * 1024)
    (0 until n).foreach { k =>
      g.write(Tar.header(s"m/$k.bin", memberLen, '0'))
      g.write(zeros) // memberLen is 512-aligned: no padding needed
    }
    g.write(new Array[Byte](1024))
    g.close()
    val blob = bos.toByteArray
    assert(blob.length < 8 * 1024 * 1024)
    val es = Tar.entries(blob)
    assert(es.length == n)
    val total = es.map(_.size).sum
    assert(total == n.toLong * memberLen)
    assert(total > Int.MaxValue.toLong)
    // read() stops inflating at its match — an early member is cheap
    val d = Tar.read(blob, "m/2.bin").get
    assert(d.length == memberLen)
    assert(d.forall(_ == 0))
  }

  test("streaming walk materializes only wanted members") {
    val blob = sample(true)
    val walked = Tar.walk(blob, _.name == "b.bin").toSeq
    assert(walked.map(_._1.name) == Seq("d/", "d/a.txt", "b.bin"))
    assert(walked(1)._2.isEmpty) // d/a.txt not wanted: skipped, not buffered
    assert(walked(2)._2.length == 700)
    assert(walked(2)._2.zipWithIndex.forall { case (b, i) => b == (i % 127).toByte })
  }

  test("GNU long-name ('L') members name the next member") {
    val longName = "deeply/nested/" + ("d" * 120) + "/file.txt"
    val nameData = (longName + "\u0000").getBytes("UTF-8")
    val payload = "long-name payload".getBytes("UTF-8")
    def pad(n: Int) = new Array[Byte]((512 - n % 512) % 512)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Tar.header("././@LongLink", nameData.length, 'L'))
    bos.write(nameData); bos.write(pad(nameData.length))
    bos.write(Tar.header("truncated-name.txt", payload.length, '0'))
    bos.write(payload); bos.write(pad(payload.length))
    bos.write(Tar.header("normal.txt", 2, '0'))
    bos.write("ok".getBytes); bos.write(pad(2))
    bos.write(new Array[Byte](1024))
    val blob = bos.toByteArray
    // the 'L' member is consumed, not listed; its name binds ONE member
    assert(Tar.entries(blob).map(_.name) == Seq(longName, "normal.txt"))
    assert(new String(Tar.read(blob, longName).get, "UTF-8") == "long-name payload")
  }

  test("pax ('x') path and size records override the next member") {
    def paxRecord(k: String, v: String): Array[Byte] = {
      val base = (" " + k + "=" + v + "\n").length
      var n = base + 1
      while (String.valueOf(n).length + base != n) n += 1
      (n + " " + k + "=" + v + "\n").getBytes("UTF-8")
    }
    val paxPath = "pax/override/" + ("p" * 130) + ".bin"
    val payload = Array.tabulate[Byte](700)(i => (i % 113).toByte)
    // size declared ONLY via pax (octal field zeroed, as archivers do
    // for members past the 12-digit octal range)
    val recs = paxRecord("path", paxPath) ++
      paxRecord("size", payload.length.toString) ++
      paxRecord("mtime", "1700000000.5") // unrelated record: ignored
    def pad(n: Int) = new Array[Byte]((512 - n % 512) % 512)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Tar.header("PaxHeaders/x", recs.length, 'x'))
    bos.write(recs); bos.write(pad(recs.length))
    bos.write(Tar.header("short.bin", 0, '0'))
    bos.write(payload); bos.write(pad(payload.length))
    bos.write(new Array[Byte](1024))
    val blob = bos.toByteArray
    val es = Tar.entries(blob)
    assert(es.map(_.name) == Seq(paxPath))
    assert(es.head.size == 700L)
    assert(Tar.read(blob, paxPath).get.toSeq == payload.toSeq)
    // malformed pax framing cuts short, never throws
    val bad = Tar.header("PaxHeaders/x", 8, 'x') ++
      "zz path=".getBytes ++ new Array[Byte](504) ++
      Tar.header("after.txt", 2, '0') ++ "ok".getBytes ++ pad(2) ++
      new Array[Byte](1024)
    assert(Tar.entries(bad).map(_.name) == Seq("after.txt"))
  }

  test("octal fields tolerate leading spaces and NUL terminators") {
    val t = sample(false).clone()
    // rewrite size field of member 2 ("  22\0...") and fix its checksum
    val h = 512
    java.util.Arrays.fill(t, h + 124, h + 136, 0.toByte)
    t(h + 124) = ' '; t(h + 125) = ' '; t(h + 126) = '2'; t(h + 127) = '2'
    java.util.Arrays.fill(t, h + 148, h + 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (t(h + i) & 0xFF))
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy(("0" * (6 - cs.length) + cs).getBytes, 0, t, h + 148, 6)
    t(h + 154) = 0; t(h + 155) = ' '
    val e = Tar.entries(t)
    assert(e(1).size == 18L) // octal "22" = 18
  }

  test("tar.zst / tar.xz / tar.bz2 walk through the codec envelope") {
    val plain = sample(false)
    for (blob <- Seq(Codecs.zstd(plain), Codecs.xz(plain), Codecs.bzip2(plain))) {
      val es = Tar.entries(blob)
      assert(es.map(_.name) == Seq("d/", "d/a.txt", "b.bin"))
      assert(new String(Tar.read(blob, "d/a.txt").get) == "file contents here")
      assert(Tar.read(blob, "b.bin").get.length == 700)
    }
    // a truncated zstd tarball keeps the members before the damage
    val z = Codecs.zstd(plain)
    assert(Tar.entries(java.util.Arrays.copyOf(z, 20)).isEmpty ||
      Tar.entries(java.util.Arrays.copyOf(z, 20)).map(_.name).forall(_.nonEmpty))
  }

  private def sparseFrags: Seq[(Long, Array[Byte])] = Seq(
    (100L, "first fragment text".getBytes("UTF-8")),
    (1000L, Array.tabulate[Byte](64)(i => (i + 1).toByte)))

  private def checkSparse(data: Array[Byte], realSize: Long): Unit = {
    assert(data.length.toLong == realSize)
    assert(new String(data.slice(100, 119), "UTF-8") == "first fragment text")
    assert(data.slice(1000, 1064).toSeq ==
      Array.tabulate[Byte](64)(i => (i + 1).toByte).toSeq)
    // holes are zero
    assert(data.slice(0, 100).forall(_ == 0))
    assert(data.slice(119, 1000).forall(_ == 0))
    assert(data.slice(1064, data.length).forall(_ == 0))
  }

  test("old-GNU 'S' sparse members expand with zero holes, real size listed") {
    val t = Tar.buildSparseOldGnu("img.raw", sparseFrags, 2000L)
    val es = Tar.entries(t)
    assert(es.map(e => (e.name, e.size, e.typeflag)) == Seq(("img.raw", 2000L, 'S')))
    checkSparse(Tar.read(t, "img.raw").get, 2000L)
  }

  test("old-GNU extended sparse map blocks (>4 fragments)") {
    // 8 fragments of 8 bytes at 512-spaced offsets -> 4 in-header + 1 ext block
    val frags = (0 until 8).map(k =>
      (k * 512L, Array.fill[Byte](8)((k + 1).toByte)))
    val t = Tar.buildSparseOldGnu("many.raw", frags, 4608L)
    val d = Tar.read(t, "many.raw").get
    assert(d.length == 4608)
    (0 until 8).foreach { k =>
      assert(d.slice(k * 512, k * 512 + 8).forall(_ == (k + 1).toByte))
      assert(d.slice(k * 512 + 8, (k + 1) * 512).forall(_ == 0))
    }
  }

  test("pax sparse dialects 0.0 / 0.1 / 1.0 expand identically") {
    for (dialect <- Seq("0.0", "0.1", "1.0")) {
      val t = Tar.buildSparsePax("img.raw", sparseFrags, 2000L, dialect)
      val es = Tar.entries(t)
      assert(es.map(e => (e.name, e.size)) == Seq(("img.raw", 2000L)), dialect)
      checkSparse(Tar.read(t, "img.raw").get, 2000L)
    }
  }

  test("pax sparse inside a zstd-wrapped tar") {
    val t = Codecs.zstd(Tar.buildSparsePax("img.raw", sparseFrags, 2000L, "1.0"))
    checkSparse(Tar.read(t, "img.raw").get, 2000L)
  }

  test("'g' global pax records apply as defaults, per-member 'x' overrides") {
    def paxRec(k: String, v: String): Array[Byte] = {
      val body = s" $k=$v\n".getBytes("UTF-8")
      var len = body.length + 1
      while (len.toString.length + body.length != len)
        len = len.toString.length + body.length
      len.toString.getBytes("US-ASCII") ++ body
    }
    val out = new java.io.ByteArrayOutputStream()
    def member(h: Array[Byte], d: Array[Byte]): Unit = {
      out.write(h); out.write(d)
      val r = out.size() % 512
      if (r != 0) out.write(new Array[Byte](512 - r))
    }
    val g = paxRec("path", "global/name.txt") ++ paxRec("ignored.key", "zz")
    member(Tar.header("./PaxHeaders/g", g.length, 'g'), g)
    member(Tar.header("hdr-a.txt", 5, '0'), "aaaaa".getBytes)
    val x = paxRec("path", "local/name.txt")
    member(Tar.header("./PaxHeaders/x", x.length, 'x'), x)
    member(Tar.header("hdr-b.txt", 5, '0'), "bbbbb".getBytes)
    member(Tar.header("hdr-c.txt", 5, '0'), "ccccc".getBytes)
    out.write(new Array[Byte](1024))
    val names = Tar.entries(out.toByteArray).map(_.name)
    // global path applies to members 1 and 3; the 'x' override wins on 2
    assert(names == Seq("global/name.txt", "local/name.txt", "global/name.txt"))
  }

  test("duplicate names: read returns the LAST complete occurrence") {
    val t = Tar.build(Seq(
      ("dup.txt", "old contents".getBytes, '0'),
      ("other.txt", "x".getBytes, '0'),
      ("dup.txt", "new contents!".getBytes, '0')))
    assert(new String(Tar.read(t, "dup.txt").get) == "new contents!")
  }
}
