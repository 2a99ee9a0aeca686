package graft.ext

/** Dev-loop differential harness: decode every libwebp-generated fixture
  * under /tmp/vp8x/fixtures and compare YUV planes byte-for-byte against
  * libwebp's own WebPDecodeYUV dumps (see tools/vp8_gen_fixtures.py).
  * Run: sbt "Test/runMain graft.ext.Vp8Dev"
  */
object Vp8Dev {
  def fnv64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xFF)) * 0x100000001b3L; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("/tmp/vp8x/fixtures")
    val names = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".webp")).sorted
    var pass = 0; var fail = 0
    for (f <- names) {
      val base = f.stripSuffix(".webp")
      val name = base.substring(base.lastIndexOf('/') + 1)
      val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      // pass 1: unfiltered recon vs libwebp bypass_filtering planes
      Vp8.debugSkipFilter = true
      val nf = Vp8.decode(data)
      Vp8.debugSkipFilter = false
      nf match {
        case Some(yuv) =>
          def refn(ext: String): Array[Byte] =
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.$ext"))
          val ok = java.util.Arrays.equals(yuv.y, refn("ny")) &&
            java.util.Arrays.equals(yuv.u, refn("nu")) &&
            java.util.Arrays.equals(yuv.v, refn("nv"))
          if (!ok) println(s"$name: RECON(nofilter) differs")
        case None => println(s"$name: RECON(nofilter) decode failed")
      }
      Vp8.decode(data) match {
        case None =>
          println(s"$name: DECODE FAILED (None)")
          fail += 1
        case Some(yuv) =>
          def ref(ext: String): Array[Byte] =
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.$ext"))
          val ry = ref("y"); val ru = ref("u"); val rv = ref("v")
          def cmp(tag: String, got: Array[Byte], want: Array[Byte], w: Int): String = {
            if (java.util.Arrays.equals(got, want)) "OK"
            else if (got.length != want.length) s"$tag LEN ${got.length}!=${want.length}"
            else {
              var i = 0
              var n = 0
              var first = -1
              var maxd = 0
              while (i < got.length) {
                if (got(i) != want(i)) {
                  if (first < 0) first = i
                  n += 1
                  val d = math.abs((got(i) & 0xFF) - (want(i) & 0xFF))
                  if (d > maxd) maxd = d
                }
                i += 1
              }
              s"$tag DIFF n=$n first=($first=${first % w},${first / w}) maxd=$maxd " +
                s"got=${got(first) & 0xFF} want=${want(first) & 0xFF}"
            }
          }
          val resY = cmp("Y", yuv.y, ry, yuv.width)
          val resU = cmp("U", yuv.u, ru, yuv.chromaW)
          val resV = cmp("V", yuv.v, rv, yuv.chromaW)
          if (resY == "OK" && resU == "OK" && resV == "OK") {
            println(s"$name: EXACT MATCH (${yuv.width}x${yuv.height})")
            pass += 1
          } else {
            println(s"$name: $resY | $resU | $resV")
            fail += 1
          }
      }
    }
    println(s"== $pass exact, $fail failing")
  }
}
