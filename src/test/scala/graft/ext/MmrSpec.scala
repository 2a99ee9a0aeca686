package graft.ext

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def refGreedy(
      pool: Seq[(Long, Array[Long], Long)], k: Int): Seq[(Int, Long)] = {
    // independent reference: same semantics, written the obvious way
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    (1 to math.min(k, pool.length)).map { rank =>
      val cand = pool.filterNot(p => sel.exists(_._1 == p._1))
        .map { case (id, v, rel) =>
          val pen = if (sel.isEmpty) 0L else sel.map(s => dot(v, s._2)).max
          (id, v, rel - pen)
        }
      val best = cand.minBy { case (id, _, score) => (-score, id) }
      sel += ((best._1, best._2))
      rank -> best._1
    }
  }

  private def quantize(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1e6).toLong)

  test("diversifiedTopK equals a brute-force greedy reference on random pools") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val dim = 8
      val n = 30
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val df = vecs.toDF("vec_id", "embedding")
      val got = Mmr.diversifiedTopK(spark, df, "vec_id", "embedding", q,
          k = 5, poolSize = n)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
      val qq = quantize(q)
      val pool = vecs.map { case (id, v) =>
        val vq = quantize(v)
        (id, vq, vq.zip(qq).map { case (x, y) => x * y }.sum)
      }.sortBy { case (id, _, rel) => (-rel, id) }
      assert(got == refGreedy(pool, 5), s"trial $trial diverged")
    }
  }

  test("an exact duplicate of the top pick is never chosen second") {
    // items 0 and 1 identical and most relevant; 2/3 orthogonal-ish
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(-0.5f, 0.5f)))
    val got = Mmr.diversifiedTopK(spark, vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", Array(1f, 0.1f), k = 3, poolSize = 4)
      .collect().map(_.getLong(1)).toSeq
    assert(got.head == 0L, "most relevant first (tie to lowest id)")
    assert(got(1) != 1L, "the duplicate must be demoted by its penalty")
  }
}
