package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** External-artifact interop certificate for the lossy VP8 pixel decoder
  * — the same discipline as [[Vp8lInteropSpec]], but differential in
  * BOTH directions:
  *
  *  1. REAL libwebp-encoded streams (generated once by the public
  *     on-disk libwebp shared library via tools/vp8_gen_fixtures.py,
  *     byte-pinned here) must decode to YUV planes whose FNV-1a64
  *     checksums equal libwebp's OWN WebPDecodeYUV output — bit-exact,
  *     filtered AND (for the normal-filter fixture) with the loop
  *     filter bypassed. Content spans flat/gradient/noise/edge images,
  *     odd (non-MB-multiple) sizes, q10-q95, i16 + B_PRED modes,
  *     segmentation with absolute quantizer indices, and both the
  *     normal and simple loop filters. The pinned `python.webp` (the
  *     CPython test-suite artifact) certifies a wild third-party file.
  *  2. The in-repo fixture encoder [[Vp8Enc]] is deterministic, and
  *     libwebp's decode of its output (tools/vp8_enc_groundtruth.py)
  *     was pinned at generation time: re-encoding here and matching
  *     those checksums certifies the ENCODER against the external
  *     implementation too — including the two-token-partition and
  *     all-ten-B_PRED-sub-mode paths libwebp's encoder never emits.
  *
  * A checksum mismatch anywhere in the bool decoder, header parse,
  * token/band/context lattice, dequant, prediction, transforms, or
  * loop filter fails these rows.
  */
class Vp8InteropSpec extends AnyFunSuite {

  private def fromHex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def fnv64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xFF)) * 0x100000001b3L; i += 1 }
    h
  }

  private val hex_flat_16x16_q75: String =
      "5249464634000000574542505650382028000000b001009d012a1000100002003425a00274ba" +
      "0005d400009bffc439d0e74397fefeb6bdb786140000"

  private val hex_grad_33x17_q50: String =
      "524946467800000057454250565038206c0000003004009d012a210011003eb94c9c4bbfa4a2" +
      "a1bab99803f017096600bb330008f0293bdfc3bd0a57fef800fef6ab7a15da6b6e73f696f632" +
      "87301b338a1177ce863bc6209dfc9da9e6fe4c89c0210d251793008f574b431c12e7567d5e63" +
      "534da3739ce66f2ad020fa094000"

  private val hex_edges_17x31_q95: String =
      "5249464610020000574542505650382004020000f00e009d012a11001f003e190a8441210603" +
      "01000400612d8013a6508f4dd067027ef77f3fe01fc03f0031c07e807f99fe01efffd201ffc3" +
      "485ff937f80f80dfe01fe4ffda7ac35d817c03f003f403f807683740bd00fd00fe01aa3fc827" +
      "b1cd00fd00a801e495f8d7e2af502ff0bfe01fe9bed8f9003f58c851583e8041949800fefffe" +
      "3a92583ada025ff98a1a7ed24feee128d636e07548a0c8f246abff314a250518c4fc7f9eef37" +
      "d79c20beb861478c6748d94e878ef6a1dbd6468155ff04a0c0cd1e0469319774a5f93298cce0" +
      "ca66fc9c434ff04a0c0cd1e0aa96d990abc9cba47d89a2e620573006fc1e64b4333f6e14219f" +
      "4bc2bffe571da3f0e825bbcc3554996bd587850d55b08e3e9b33bb5434e58f3981c0cfe3ffff" +
      "57b9aa49784f9fed3fff7413ffaa70b852335c75d1d686b7642f4bbaf2b5389263e9b06661f1" +
      "18eb5d89fd271fad21bfed0848f3dffebcab720bd22c35013f7bab38400f75022a6945c1475d" +
      "bbd2d7abeffa9f083f8769b675568aaf70663b8f457c51c602fffb409e0e8bcf4f9d8ad97f3a" +
      "843cdb7d4fd213879965991042a8ff8a0c06c0be1120d98be0e41b1d6c19924e8bc81fe9faf4" +
      "c9bbbcb50ebe9b4bb25ad7f3fa6cceed50d39084cea64d113621f1e74759cac7335ad5d58449" +
      "ffcce813fffff9601f8153d271c0a9e934efd05230ddf2bfdfdc4cb3e1ad8067726384daf7ea" +
      "19de4000"

  private val hex_noise_32x32_q50: String =
      "52494646b40200005745425056503820a8020000b00c009d012a2000200002c04c25b00274ca" +
      "0c60d701b603700741dfa8073e7fb067f75ffa56a08d03e82ec59204e3dce07801f5479a9fee" +
      "1e00df1aff01d26bfb07888f9d7d80bf5b7d1e3d5dfec07b2c7ec318c8f5dca19471e946d69b" +
      "272fb7d247e35b7cd7922521fbe80d0000f8cdc89ee7a84e009485613c04ccb5091530b30434" +
      "af1425f245d34546a26ac5a0e569cbfc39dfc98a13f9a37eb78e9be7427c96600e1fd511f99a" +
      "0127e2cabe5b9e94ad33ed8bda0dd183801eb01301f037359a4a80c5a7d24b93188d4a8bc18a" +
      "fd6ccebf7e05bdd3fe08bc1783dd6e4b32de5dd38a483953c5f2be6ff5c7648600ccd9f4ead1" +
      "97e3fe05dbfcc7996c70fd2f5f8d3abca408d8635c738443ae1b91fb4335c1dfc8b3397f3fcf" +
      "16e832bdf5c3a39b8ae0907c63241e15a85a81470d417b95ebdfd05e56425903f21dc1035358" +
      "1fd6f0e803b184a50cc1ef0f12b0c6743bdf3feb7b2cdb8f53403532e1f5f21305ec106bae48" +
      "9295f070db4ac931bb672a9b5afe70bce50ba8d87ca89560fc3de2a6c5486518f556a7dafc4f" +
      "4087017ffe4461e846bea0d5b0d972b93075b835c3c0cbc05b2ef752f440624a7cc6d8296a46" +
      "e0c8f383683af64a760b053b76ae0d1874ab6dfe32423ca28fd03e0520f5e6c0ff33bb55ee2a" +
      "f97d8eb76eaf7df29005dfe32b77166d2e90debd2e7610fcab478f5d3e3fc65118298279bdca" +
      "dedab208aa2288d54e5a9c749a39bf7f0dc116cf136ede14fe67678fd115dd5f8f9e93c80f66" +
      "6cee7f30ccbd9ad9324d7921567c84c0ca6d5bdbe96702dcc39e260e30e504761a999909d54a" +
      "4bfee61d83ac11ea1766793f00b432f3e61a406cca90b8257e19a9267708d26fd84479770122" +
      "d4622287b0ba9a5e9bf870bf5c3652119d3245e6f4f1f4f6d3976a0790ab186a5910a26470dd" +
      "dd41ee236e11ae8ef15d0667a0000000"

  private val hex_simple2_48x48_q40: String =
      "524946462c0100005745425056503820200100003208009d012a3000300011c05a25a40274ca" +
      "11cd1e8fe6095cfeedaf66446bbbea23f356f4638f9a7ece0f1754465ef6d151c0896a61aaa4" +
      "9fdeb512a63524d3acce8ab33b74244bbfc000fe68f9a864a05a37a8293a966e1a6d9465f78d" +
      "4d7e159b3a47d064438224484396030630f782e9c3390f921ecd5d0d2bd7d3c63c3f5273914a" +
      "d592786b2597d5fd7f318fe6cb53c4385250600aff9852d5bed5861e181347c7cf106a789ad7" +
      "92afca987717326c78a88f0afab4b2869f886bd27b0e53b2883ae5ccf7609dc53b9f24439fb8" +
      "67484705bd8dfb4356791395f80a03c1523f432b86e17c01bc2e54f834f01d9b615830debb85" +
      "6c18df063f1967e1a39cb66d684d76f9b03662b061e4b0f6a556ff651ab32c7477d61166add1" +
      "bb900000"

  private val hex_parts8_96x64_q50: String =
      "52494646fe0200005745425056503820f20200001016009d012a600040003ed158a04d282522" +
      "a22d566db1001a096c009d328478879f7e51fb0252ffbfec8e10eee471c5ea77f36ef493c405" +
      "ffc04e7b5ff1eafa78b2e88a22d596f70a5b565e8c61ead32df73700db8f4815fd4eeb7902fe" +
      "e5ed5d297dec21ad07370413bd6e05071acfbe2dc778aa81d1a4bb5fc1ed59ffd36d6c1a23cb" +
      "0fba1c68779cc9d32e8bb93eb9066f1bb8bc73ccde502225b1a48ff90db95e84de2619a197dd" +
      "786bab218c88b32ff6bb4e17247e0000feb742ff08618ef81fdcf7a1a0d04702d718053ec135" +
      "45f31f6906192b4cc591602bd18f8f573059c0672e0458ab5fef507d3a338c0850bd6e9cc81c" +
      "95dc3ba76a561c7fb4d3e95d39cbd6517f98be440dadd95f51b7b098300ae2f2d49436252042" +
      "62f0436c6c653bbb445f468bbf6cfded4acb3f81a20eeea11ce2ba2e6638f3e968f02ae5799a" +
      "c428a57e251ff0ddce046aad1bf2e596af4ec227be73cab11611b85b0cdf999afbbeb4ba812c" +
      "b9787994d33d4b40fdd0f693ab566a5434b6c833d3e0ed4389e49826cbe1d2e67673f98351d4" +
      "b27d65cfd9f5bde03d76731e699a4d227cfac736a43447300ce9192a9195246e307b1ef36482" +
      "8964f333dd6faa6acc4b53b2152d627e1b5397cf534a73a6cf977cd40027b800dc5e41fbbbd7" +
      "1e076077654b35b7a3f8ebeab1c37472f5fa09601f1d9081d31996998ea63b10fed68a89525e" +
      "735d483e7bdbfc5f97c1ecc54aa11edf151f67961481031a55d09b57328ba51aaf62bf7e927e" +
      "93baa53fa0ba46959b77539a9284956a3fec530ed8b4a3be8d2dad6414ab206ee053e7026c69" +
      "b157b81b1f7c0b6e00118f22f753c3ed6e2228624f0834cabf0ac6ab9ac77b3de4ba46f6078b" +
      "cd636c93657e7489c19227cc005def9e12e3c5fb42ec5118dba3a65c24efee1a9f53a1fbd89c" +
      "bf8e1094086a986f13dae1ee20b75d936684855e83c93df3c667742be09def0688a2fcc9b70c" +
      "22216646006953999f6e58af3cda0b28fd2afd0211677990e42623a08b539e1042084ad2bfdb" +
      "e18a78cf7204f9a01c7131200000"

  private val hex_python: String =
      "52494646a801000057454250565038580a000000100000000f00000f0000414c5048c3000000" +
      "0127a2a89124e57ae7185fe7df2a998898ff74718de02630e2e18b7732c8c1115c832b30e8b0" +
      "78158e785135c1080c024f92a06ab055191cd6b66d462f4ec6763cb6ed77fbaf29ae21a2ff49" +
      "d1fd8f90f7ba4449241b3a259134f3146d0ec7d3e51620f40b14be90e183b71a329e36827f1d" +
      "297e4e7608fb889eb391ef997346e83282dbf8cc48b2f745307d20fd36178c2132562da5d66b" +
      "23bc5de3a55915d59c81a4d96e96758a18310f8aaa2c5034fa3082dfba6b505229b52dcfe954" +
      "140a0100000056503820be0000009002009d012a1000100003003425b00274304f08850c7c03" +
      "1d082cfde800fefd74a0fd029b1f8af7437c9c37f6d20cafd3ff3568e2eea7bdc96f1bf4aac5" +
      "63aeba9f9784df41a23bda5be4eff8cbf1bd7fe1affa3fe509ecf4bb665fffaa29d97fc96ce7" +
      "86e6ac97b9e4c6f493238c5fdd8f3955207f954ffc39f8ff6fd26b03e89fbc8398666db1d513" +
      "ff7617e6b1fe5d8ae49f47bfb3fabffe1d1df3128ffe5ccfc1faf918c3bdcfcf1f9139a001fd" +
      "9a014b312cdebcd97baaac000000"

  private val fixtures = Seq(

    ("flat_16x16_q75", hex_flat_16x16_q75, 6877401253429467173L, 3103891654874020219L, -2942157075691301851L, 6877401253429467173L),
    ("grad_33x17_q50", hex_grad_33x17_q50, -8215774964737767244L, -7975002982020455015L, 7812150182854436839L, 432382661797938279L),
    ("edges_17x31_q95", hex_edges_17x31_q95, 1689839540815886830L, 1551050327713787702L, 4384245841237421172L, 1689839540815886830L),
    ("noise_32x32_q50", hex_noise_32x32_q50, -1435205995593067176L, 4856076816365901402L, 3472822233247102761L, -1435205995593067176L),
    ("simple2_48x48_q40", hex_simple2_48x48_q40, 2241976681593082675L, 5433711552957683452L, -1685720716885781598L, -7484110491148539357L),
    ("parts8_96x64_q50", hex_parts8_96x64_q50, 512398563020771743L, 1554063295013457528L, 7341443377717574468L, 4790352278957122774L),
    ("python", hex_python, -3736537170197266843L, 7417023920777726346L, -1944164746498674307L, 2888438951483264426L))


  test("real libwebp streams decode bit-exactly (pinned WebPDecodeYUV checksums)") {
    for ((name, hx, fy, fu, fv, _) <- fixtures) {
      val data = fromHex(hx)
      val dec = Vp8.decode(data)
      assert(dec.isDefined, s"$name failed to decode")
      val yuv = dec.get
      assert(fnv64(yuv.y) == fy, s"$name: Y plane mismatch")
      assert(fnv64(yuv.u) == fu, s"$name: U plane mismatch")
      assert(fnv64(yuv.v) == fv, s"$name: V plane mismatch")
    }
  }

  test("loop-filter-bypassed reconstruction matches libwebp bypass_filtering") {
    for ((name, hx, _, _, _, fny) <- fixtures) {
      Vp8.debugSkipFilter = true
      try {
        val yuv = Vp8.decode(fromHex(hx)).get
        assert(fnv64(yuv.y) == fny, s"$name: unfiltered Y mismatch")
      } finally Vp8.debugSkipFilter = false
    }
  }

  test("the pinned artifacts carry the expected content classes") {
    val (_, pyHex, _, _, _, _) = fixtures.find(_._1 == "python").get
    val m = Webp.meta(fromHex(pyHex))
    assert(m.exists(mm => mm.width == 16 && mm.height == 16))
    val simple = fromHex(fixtures.find(_._1 == "simple2_48x48_q40").get._2)
    assert(Vp8.decode(simple).exists(y => y.width == 48 && y.height == 48))
  }

  test("python.webp decodes FULLY: lossy VP8 color + VP8L-coded alpha as RGBA") {
    // the artifact's complete layout at last — round 13 decoded its alpha,
    // round 15 its color; this row pins the merged 4-channel image
    val bytes = fromHex(fixtures.find(_._1 == "python").get._2)
    val img = Vp8.decodeToImage(bytes).getOrElse(fail("full decode failed"))
    assert(img.width == 16 && img.height == 16 && img.channels == 4)
    // the alpha channel is the REAL ALPH plane (transparent corners on the
    // logo), and matches the standalone alpha decode byte-for-byte
    val (aw, ah, alpha) = Webp.alphaPlane(bytes).get
    assert(aw == 16 && ah == 16)
    val gotAlpha = Array.tabulate(256)(i => img.pixels(i * 4 + 3))
    assert(java.util.Arrays.equals(gotAlpha, alpha))
    assert(alpha.exists(_ == 0) && alpha.exists(a => (a & 0xFF) == 255),
      "logo alpha must carry both transparent and opaque pixels")
    // and decodeAny serves the 4-channel image (the dedup entry point)
    assert(Png.decodeAny(bytes).exists(_.channels == 4))
  }

  // (w, h, qIndex, i4Every, seed, libwebp-decoded plane checksums)
  private val encPins = Seq(

    (48, 32, 12, 3, 2, -5082756749869611045L, 7413020493572032275L, 2310245317654992046L),
    (33, 17, 8, 1, 3, 5983825318601107763L, 6653716721422553362L, 2809006794822604477L))


  private def seedImg(w: Int, h: Int, seed: Int): Png.Image = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      px(i * 3) = ((x * 255 / math.max(w - 1, 1)) & 0xFF).toByte
      px(i * 3 + 1) = ((y * 255 / math.max(h - 1, 1)) & 0xFF).toByte
      px(i * 3 + 2) = (((x * 31 + y * 17 + seed * 101) ^ (seed * 7)) & 0xFF).toByte
      i += 1
    }
    Png.Image(w, h, 3, px)
  }

  test("Vp8Enc streams reproduce libwebp's pinned decode of them") {
    for ((w, h, q, i4, seed, fy, fu, fv) <- encPins) {
      val src = Vp8Enc.toYuv420(seedImg(w, h, seed))
      val webp = Vp8Enc.encodeYuv(src, q, i4)
      val dec = Vp8.decode(webp)
      assert(dec.isDefined, s"enc ${w}x$h q$q i4=$i4 failed to decode")
      val yuv = dec.get
      assert(fnv64(yuv.y) == fy, s"enc ${w}x$h: Y != libwebp's decode")
      assert(fnv64(yuv.u) == fu, s"enc ${w}x$h: U != libwebp's decode")
      assert(fnv64(yuv.v) == fv, s"enc ${w}x$h: V != libwebp's decode")
      // and the lossy drift vs the source stays within the quant budget
      def maxd(a: Array[Byte], b: Array[Byte]): Int = {
        var m = 0
        var i = 0
        while (i < a.length) { m = math.max(m, math.abs((a(i) & 0xFF) - (b(i) & 0xFF))); i += 1 }
        m
      }
      assert(maxd(yuv.y, src.y) <= 10, s"enc ${w}x$h: Y drift")
    }
  }
}
