package graft.ext

/** Bencode + BitTorrent metainfo (.torrent) — the sidecar format
  * content-distribution crawls collect by the million. Bencode (BEP 3)
  * is four productions: `i<int>e`, `<len>:<bytes>`, `l...e`, `d...e`
  * with byte-string keys in sorted order. The torrent layer reads
  * announce, the info dict (name, piece length, single-file length or
  * the multi-file list) and computes the INFOHASH — SHA-1 over the
  * info dict's exact bencoded span, which is why [[parse]] tracks the
  * byte range of every value instead of re-encoding (re-encoding a
  * parsed dict is the classic infohash bug when the source wasn't
  * canonically sorted).
  *
  * Scale shape: one metainfo = one payload row, map-only on executors.
  */
object Bencode {

  /** Parsed value: Long, Array[Byte] (strings are bytes in bencode),
    * Vector[Any], or Map[String, Any] — plus the value's [start, end)
    * byte span for infohash computation.
    */
  final case class Val(value: Any, start: Int, end: Int)

  /** Parse the value at `at`. Throws on malformed input (callers wrap).
    * `depth` bounds nesting: a run of 'l'/'d' bytes recurses once per
    * level, so without the bound a few hundred KB of 'l's reaches
    * StackOverflowError — an Error that escapes the callers' Exception
    * catch. Real torrents nest <10 deep; 256 is generous.
    */
  private[ext] def parse(b: Array[Byte], at: Int, depth: Int = 0): Val = {
    if (depth > 256)
      throw new IllegalArgumentException("bencode nested deeper than 256")
    (b(at) & 0xFF).toChar match {
      case 'i' =>
        val e = indexOf(b, 'e', at + 1)
        Val(new String(b, at + 1, e - at - 1, "US-ASCII").toLong, at, e + 1)
      case 'l' =>
        var i = at + 1
        val out = Vector.newBuilder[Any]
        while ((b(i) & 0xFF) != 'e') {
          val v = parse(b, i, depth + 1); out += v.value; i = v.end
        }
        Val(out.result(), at, i + 1)
      case 'd' =>
        var i = at + 1
        val out = scala.collection.immutable.VectorMap.newBuilder[String, Val]
        while ((b(i) & 0xFF) != 'e') {
          val k = parse(b, i, depth + 1)
          val v = parse(b, k.end, depth + 1)
          out += new String(k.value.asInstanceOf[Array[Byte]], "UTF-8") -> v
          i = v.end
        }
        Val(out.result(), at, i + 1)
      case c if c.isDigit =>
        val colon = indexOf(b, ':', at)
        val len = new String(b, at, colon - at, "US-ASCII").toInt
        Val(java.util.Arrays.copyOfRange(b, colon + 1, colon + 1 + len),
          at, colon + 1 + len)
      case c => throw new IllegalArgumentException(s"bencode: '$c'")
    }
  }

  private def indexOf(b: Array[Byte], c: Char, from: Int): Int = {
    var i = from
    while ((b(i) & 0xFF) != c) i += 1
    i
  }

  final case class Torrent(announce: String, name: String,
      pieceLength: Long, totalLength: Long,
      files: Vector[(String, Long)], // (joined path, length)
      infoHashHex: String)

  /** None when the payload is not a metainfo dict with an info entry. */
  def torrent(b: Array[Byte]): Option[Torrent] =
    try {
      val top = parse(b, 0)
      val dict = top.value.asInstanceOf[Map[String, Val]]
      val info = dict.getOrElse("info", return None)
      val im = info.value.asInstanceOf[Map[String, Val]]
      def str(m: Map[String, Val], k: String): String =
        m.get(k).map(v => new String(v.value.asInstanceOf[Array[Byte]], "UTF-8"))
          .getOrElse("")
      def num(m: Map[String, Val], k: String): Long =
        m.get(k).map(_.value.asInstanceOf[Long]).getOrElse(0L)
      val files = im.get("files") match {
        case Some(fl) =>
          fl.value.asInstanceOf[Vector[Any]].map { f =>
            val fm = f.asInstanceOf[Map[String, Val]]
            val path = fm("path").value.asInstanceOf[Vector[Any]]
              .map(p => new String(p.asInstanceOf[Array[Byte]], "UTF-8"))
              .mkString("/")
            (path, fm("length").value.asInstanceOf[Long])
          }
        case None => Vector.empty
      }
      val total =
        if (files.nonEmpty) files.map(_._2).sum else num(im, "length")
      val sha = java.security.MessageDigest.getInstance("SHA-1")
        .digest(java.util.Arrays.copyOfRange(b, info.start, info.end))
      Some(Torrent(str(dict, "announce"), str(im, "name"),
        num(im, "piece length"), total, files,
        sha.map(x => f"${x & 0xFF}%02x").mkString))
    } catch { case _: Exception => None }

  /** Canonical bencode encoder for fixtures (dict keys sorted). */
  private[graft] def encode(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def go(v: Any): Unit = v match {
      case n: Long => out.write(s"i${n}e".getBytes("US-ASCII"))
      case n: Int => go(n.toLong)
      case s: String => go(s.getBytes("UTF-8"))
      case a: Array[Byte] =>
        out.write(s"${a.length}:".getBytes("US-ASCII")); out.write(a)
      case l: Seq[_] =>
        out.write('l'); l.foreach(go); out.write('e')
      case m: Map[_, _] =>
        out.write('d')
        m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).foreach {
          case (k, vv) => go(k); go(vv)
        }
        out.write('e')
      case other =>
        throw new IllegalArgumentException(s"bencode: ${other.getClass}")
    }
    go(v)
    out.toByteArray
  }
}
