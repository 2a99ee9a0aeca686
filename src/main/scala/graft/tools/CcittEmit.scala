package graft.tools

import java.nio.file.{Files, Paths}

import graft.ext.{Png, TiffImg}

/** Dump the deterministic [[TiffImg.buildBilevel]] encoder outputs that
  * tools/ccitt_gen_fixtures.py `check-enc` feeds to libtiff — the
  * encoder half of the CCITT differential certificate (the
  * vp8_enc_groundtruth recipe). File names carry kind_w_h_comp_t4opts
  * so the python side can regenerate the source bitmap independently.
  *
  * Usage: runMain graft.tools.CcittEmit
  */
object CcittEmit {

  /** Must mirror tools/ccitt_gen_fixtures.py + CcittInteropSpec. */
  private[graft] def lcgBitmap(w: Int, h: Int, kind: String,
      seed: Long): Array[Byte] = {
    val bm = new Array[Byte](w * h)
    val it = Iterator.iterate(seed)(s =>
        s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(s => ((s >>> 33) & 0xFF).toInt)
    kind match {
      case "solid-white" => ()
      case "solid-black" => java.util.Arrays.fill(bm, 1.toByte)
      case "speckle" =>
        var i = 0
        while (i < bm.length) { bm(i) = (if (it.next() < 60) 1 else 0).toByte; i += 1 }
      case "runs" =>
        var y = 0
        while (y < h) {
          var x = 0
          var black = false
          while (x < w) {
            val run = 1 + it.next() % 17
            var k = 0
            while (k < run && x < w) {
              bm(y * w + x) = (if (black) 1 else 0).toByte; x += 1; k += 1
            }
            black = !black
          }
          y += 1
        }
      case "vstripes" =>
        var i = 0
        while (i < bm.length) { bm(i) = ((i % w / 3) & 1).toByte; i += 1 }
    }
    bm
  }

  /** The configurations whose encPins CcittInteropSpec re-generates. */
  private[graft] val configs: Seq[(String, Int, Int, Int, Int)] = Seq(
    ("runs", 61, 9, 2, 0),
    ("runs", 61, 9, 3, 0),
    ("vstripes", 61, 9, 3, 4),
    ("runs", 64, 16, 3, 1),
    ("speckle", 61, 9, 3, 5),
    ("runs", 61, 9, 4, 0),
    ("speckle", 64, 16, 4, 0),
    ("runs", 2800, 4, 4, 0),
    ("solid-black", 40, 7, 4, 0))

  private[graft] def buildOne(kind: String, w: Int, h: Int, comp: Int,
      t4: Int): Array[Byte] = {
    val bm = lcgBitmap(w, h, kind, w * 1000L + h)
    val gray = bm.map(v => if (v != 0) 0x00.toByte else 0xFF.toByte)
    TiffImg.buildBilevel(Png.Image(w, h, 1, gray), comp, t4)
  }

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("/tmp/ccittx/enc")
    Files.createDirectories(dir)
    for ((kind, w, h, comp, t4) <- configs) {
      val tiff = buildOne(kind, w, h, comp, t4)
      Files.write(dir.resolve(s"${kind}_${w}_${h}_${comp}_$t4.tif"), tiff)
    }
    println(s"wrote ${configs.size} encoder outputs to $dir")
  }
}
