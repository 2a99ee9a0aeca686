package graft.ext

/** TAR (POSIX ustar) archive walk — crawl datasets and software
  * artifacts ship as `.tar`/`.tar.gz` blobs; the walk lists and extracts
  * members from in-row byte arrays the way [[Zip]] does for PKWARE
  * archives.
  *
  * Envelope (POSIX.1-1988 ustar layout):
  *   - 512-byte headers: name(100) + octal size(12) + mtime(12) +
  *     checksum(8) + typeflag + ustar magic + prefix(155); data rounded
  *     up to 512-byte blocks; two zero blocks end the archive.
  *   - Header CHECKSUMS are verified (sum of header bytes with the
  *     checksum field read as spaces) — a corrupt header ends the walk
  *     at the last good member.
  *   - A leading gzip magic transparently inflates first (`.tar.gz`).
  *   - GNU long-name ('L') extensions and sparse files are out of
  *     envelope, documented; pax extended headers ('x'/'g') are skipped
  *     as data, keeping the walk aligned.
  */
object Tar {

  final case class Entry(
      name: String,
      size: Long,
      typeflag: Char, // '0' file, '5' directory, '2' symlink, ...
      mtime: Long,
      data_offset: Long)

  private def gunzipIfNeeded(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 2 ||
        (b(0) & 0xFF) != 0x1F || (b(1) & 0xFF) != 0x8B) return b
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    // size HINT only, capped: b.length*4 overflows Int past 512 MiB and
    // a large up-front allocation is waste when the output is small
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(b.length.toLong * 4, 16L << 20).toInt))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // leading spaces/NULs tolerated, digits until space/NUL
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) | (b(i) - '0')
      i += 1
    }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, "UTF-8")
  }

  private def checksumOk(b: Array[Byte], h: Int): Boolean = {
    val stored = octal(b, h + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(h + i) & 0xFF)
      i += 1
    }
    sum == stored
  }

  /** Member listing over a `.tar` or `.tar.gz` payload. Offsets refer to
    * the (inflated) archive bytes.
    */
  def entries(raw: Array[Byte]): Seq[Entry] =
    entriesInflated(try gunzipIfNeeded(raw)
    catch { case scala.util.control.NonFatal(_) => null })

  /** [[entries]] over already-inflated archive bytes — lets [[read]]
    * inflate a `.tar.gz` exactly once.
    */
  private def entriesInflated(b: Array[Byte]): Seq[Entry] = {
    try {
      if (b == null || b.length < 512) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
      var h = 0
      var ok = true
      while (ok && h + 512 <= b.length) {
        if (b(h) == 0) ok = false // zero block: end of archive
        else if (!checksumOk(b, h)) ok = false
        else {
          val prefix = str(b, h + 345, 155)
          val name0 = str(b, h, 100)
          val name = if (prefix.nonEmpty) prefix + "/" + name0 else name0
          val size = octal(b, h + 124, 12)
          val tf = { val c = b(h + 156).toChar; if (c == 0) '0' else c }
          if (size < 0 || h + 512 + size > b.length.toLong) ok = false
          else {
            out += Entry(name, size, tf, octal(b, h + 136, 12), h + 512L)
            h += 512 + (((size + 511) / 512) * 512).toInt
          }
        }
      }
      out.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** One member's bytes by name ('.tar' or '.tar.gz' payload; the
    * archive inflates exactly once).
    */
  def read(raw: Array[Byte], name: String): Option[Array[Byte]] =
    try {
      val b = gunzipIfNeeded(raw)
      entriesInflated(b).find(e => e.name == name && e.typeflag == '0').flatMap { e =>
        if (e.data_offset + e.size > b.length || e.size > Int.MaxValue) None
        else Some(java.util.Arrays.copyOfRange(b, e.data_offset.toInt,
          (e.data_offset + e.size).toInt))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Assemble a tar (optionally gzipped) from (name, bytes, typeflag)
    * members — the spec/certificate builders' counterpart.
    */
  private[graft] def build(members: Seq[(String, Array[Byte], Char)],
      gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data, tf) <- members) {
      val h = new Array[Byte](512)
      val nameB = name.getBytes("UTF-8")
      require(nameB.length <= 100, s"long names out of builder envelope: $name")
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val pad = len - 1 - s.length
        var i = 0
        while (i < pad) { h(off + i) = '0'; i += 1 }
        System.arraycopy(s.getBytes("US-ASCII"), 0, h, off + pad, s.length)
      }
      oct(100, 8, 420) // mode 0644
      oct(108, 8, 0); oct(116, 8, 0)
      oct(124, 12, data.length)
      oct(136, 12, 1755000000L)
      h(156) = tf.toByte
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(263) = '0'; h(264) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(c => sum += (c & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      var i = 0
      while (i < 6 - cs.length) { h(148 + i) = '0'; i += 1 }
      System.arraycopy(cs.getBytes("US-ASCII"), 0, h, 148 + (6 - cs.length), cs.length)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - (data.length % 512)) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    val tar = out.toByteArray
    if (!gzip) tar
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(tar); g.close()
      bos.toByteArray
    }
  }
}
