package graft.ext

/** For each B_PRED block of a chosen MB: implied_pred = ref_nofilter -
  * (final - pred). Finds which mode formula reproduces implied_pred
  * given the canvas inputs (valid while the neighborhood is exact).
  */
object Vp8Modes {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "python"
    val tmbX = if (args.length > 1) args(1).toInt else 0
    val tmbY = if (args.length > 2) args(2).toInt else 0
    val base = s"/tmp/vp8x/fixtures/$name"
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.webp"))
    val ry = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base.ny"))
    // width from my own decode
    Vp8.debugSkipFilter = true
    val w = Vp8.decode(data).get.width
    Vp8.debugAL = (mbX, mbY, j, mode, a8, l4, p0, pred, fin) => {
      if (mbX == tmbX && mbY == tmbY) {
        val br = j >> 2; val bc = j & 3
        val implied = Array.tabulate(16) { k =>
          val r = k >> 2; val c = k & 3
          (ry((mbY * 16 + br * 4 + r) * w + mbX * 16 + bc * 4 + c) & 0xFF) - fin(k) + pred(k)
        }
        val ok = (0 until 16).forall(k => implied(k) == pred(k))
        if (!ok) {
          // compute every mode's prediction from (a8, l4, p0)
          val cand = (0 until 10).map { m =>
            val buf = new Array[Int](16)
            Vp8.predictInto(m, a8, l4, p0, buf)
            m -> buf
          }
          val hits = cand.filter(c => (0 until 16).forall(k => c._2(k) == implied(k))).map(_._1)
          println(s"B($br,$bc) decoded=$mode impliedMatches=${hits.mkString(",")}" +
            (if (hits.isEmpty) s"  A=${a8.mkString(",")} L=${l4.mkString(",")} P=$p0 implied=${implied.mkString(",")}" else ""))
        } else println(s"B($br,$bc) decoded=$mode OK")
      }
    }
    Vp8.decode(data)
    Vp8.debugAL = null
    Vp8.debugSkipFilter = false
  }
}
