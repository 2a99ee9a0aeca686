package graft.ext

/** Netpbm binary formats — P4 (1-bit bitmap, MSB-first rows), P5 (gray),
  * P6 (RGB), maxval ≤ 255 — the interchange rasters scientific and
  * legacy-dataset corpora still ship. Header is ASCII tokens with
  * `#`-comment lines legal anywhere between them. Total over hostile
  * bytes; decode output is a [[Png.Image]] behind the usual seam.
  */
object Pnm {

  def decode(b: Array[Byte]): Option[Png.Image] = {
    try {
      if (b == null || b.length < 7 || b(0) != 'P') return None
      val kind = b(1) - '0'
      if (kind < 4 || kind > 6) return None
      var i = 2
      // read the next ASCII integer token, skipping whitespace + comments
      def token(): Int = {
        var inComment = false
        while (i < b.length && {
          val c = b(i)
          if (inComment) { if (c == '\n') inComment = false; true }
          else if (c == '#') { inComment = true; true }
          else c == ' ' || c == '\t' || c == '\r' || c == '\n'
        }) i += 1
        var v = -1
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (b(i) - '0')
          if (v > (1 << 24)) return -1
          i += 1
        }
        v
      }
      val w = token()
      val h = token()
      if (w <= 0 || h <= 0 || w.toLong * h * 4 > (1L << 28)) return None
      val maxval = if (kind == 4) 255 else token()
      if (maxval <= 0 || maxval > 255) return None
      // exactly ONE whitespace byte separates header from raster — and it
      // must BE whitespace: a malformed header (maxval followed by '#' or
      // a truncated token) would otherwise decode shifted raster bytes
      // into a plausible-looking image instead of returning None
      if (i >= b.length ||
        !(b(i) == ' ' || b(i) == '\t' || b(i) == '\r' || b(i) == '\n'))
        return None
      i += 1
      kind match {
        case 4 =>
          val rowBytes = (w + 7) / 8
          if (i + rowBytes.toLong * h > b.length) return None
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bit = (b(i + y * rowBytes + x / 8) >> (7 - x % 8)) & 1
              // PBM: 1 = black
              px(y * w + x) = if (bit == 1) 0x00 else 0xFF.toByte
              x += 1
            }
            y += 1
          }
          Some(Png.Image(w, h, 1, px))
        case 5 =>
          if (i + w.toLong * h > b.length) return None
          Some(Png.Image(w, h, 1,
            java.util.Arrays.copyOfRange(b, i, i + w * h)))
        case _ =>
          if (i + 3L * w * h > b.length) return None
          Some(Png.Image(w, h, 3,
            java.util.Arrays.copyOfRange(b, i, i + 3 * w * h)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** True when the magic + immediate whitespace look like binary netpbm
    * (sniff gate — 'P4'..'P6' then a whitespace byte).
    */
  def isPnm(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && b(0) == 'P' && b(1) >= '4' && b(1) <= '6' &&
      (b(2) == ' ' || b(2) == '\t' || b(2) == '\r' || b(2) == '\n' || b(2) == '#')

  /** Deterministic builder: P5 for gray input, P6 for RGB (with a
    * comment line so the header tokenizer's comment path is exercised).
    */
  private[graft] def build(img: Png.Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3, "pnm builder: gray or rgb")
    val kind = if (img.channels == 1) 5 else 6
    val head = s"P$kind\n# graft fixture\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    head ++ img.pixels
  }
}
