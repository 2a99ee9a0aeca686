package graft.ext
import org.scalatest.funsuite.AnyFunSuite
class Mp3DriftTmpSpec extends AnyFunSuite {
  test("drift distribution") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val dists = (0 until 60).map { i =>
      val target = mix(i * 25L + 7)
      val samples = AudioFp.synthSamples(target)
      val fp = AudioFp.fingerprint(Mp3.decodeMono(Mp3Enc.encode(samples)).get)
      val d = java.lang.Long.bitCount(fp ^ target)
      // which frame transitions drifted?
      if (d > 2) {
        val bits = (0 until 64).filter(b => ((fp ^ target) >>> b & 1) == 1)
        info(s"i=$i d=$d frames=${bits.map(_ / 8).distinct.sorted} bands=${bits.map(_ % 8).sorted}")
      }
      d
    }
    info(s"max=${dists.max} mean=${dists.sum.toDouble / dists.size} hist=${dists.groupBy(identity).map{case(k,v)=>k->v.size}.toSeq.sorted}")
  }
}
