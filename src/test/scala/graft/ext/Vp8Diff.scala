package graft.ext

/** Per-pixel diff bitmap for one fixture: '.' match, 'x' diff. */
object Vp8Diff {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "python"
    val base = s"/tmp/vp8x/fixtures/$name"
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.webp"))
    val nofilter = args.length > 1 && args(1) == "nf"
    Vp8.debugSkipFilter = nofilter
    val yuv = Vp8.decode(data).get
    Vp8.debugSkipFilter = false
    val ry = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base." + (if (nofilter) "ny" else "y")))
    val w = yuv.width; val h = yuv.height
    var r = 0
    while (r < math.min(h, 48)) {
      val sb = new StringBuilder
      var c = 0
      while (c < math.min(w, 120)) {
        sb += (if (yuv.y(r * w + c) == ry(r * w + c)) '.' else 'x')
        c += 1
      }
      println(f"$r%3d $sb")
      r += 1
    }
  }
}
