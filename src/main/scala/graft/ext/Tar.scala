package graft.ext

/** TAR (POSIX ustar) archive walk — crawl datasets and software
  * artifacts ship as `.tar`/`.tar.gz` blobs; the walk lists and extracts
  * members from in-row byte arrays the way [[Zip]] does for PKWARE
  * archives.
  *
  * Memory contract: the walk is a SINGLE forward pass over an
  * `InputStream` — a `.tar.gz`/`.tar.zst`/`.tar.xz`/`.tar.bz2`
  * inflates through the matching [[Codecs]] decompressor in bounded
  * windows and unwanted member data is SKIPPED, not buffered, so
  * per-row heap is O(one wanted member), independent of how large the
  * archive inflates in total (a ~1 GB-per-row crawl artifact that
  * inflates past the ≤2 GiB single-array JVM cap still walks). [[read]]
  * stops inflating at its match; [[entries]] never materializes member
  * data at all. The only inherent cap is per MEMBER on extraction: one
  * member's bytes are one `Array[Byte]`, so members past ~2 GiB list
  * fine but read as None.
  *
  * Envelope (POSIX.1-1988 ustar layout):
  *   - 512-byte headers: name(100) + octal size(12) + mtime(12) +
  *     checksum(8) + typeflag + ustar magic + prefix(155); data rounded
  *     up to 512-byte blocks; two zero blocks end the archive.
  *   - Header CHECKSUMS are verified (sum of header bytes with the
  *     checksum field read as spaces) — a corrupt header ends the walk
  *     at the last good member.
  *   - A leading gzip/zstd/xz/bzip2 magic transparently inflates first
  *     (`.tar.gz`, `.tar.zst`, `.tar.xz`, `.tar.bz2` — the compression
  *     wrappers software and corpus tarballs actually ship in).
  *   - GNU long-name ('L') members and pax extended headers ('x') ARE
  *     honored: the 'L' data names the next member; pax `path=` and
  *     `size=` records override the next member's name and data length
  *     (how archivers encode >8 GiB members past the 12-digit octal
  *     field). Global pax headers ('g') are skipped as data, keeping the
  *     walk aligned; sparse files stay out of envelope, documented. Meta
  *     member data is capped at 1 MiB — a "name" past that is damage,
  *     and the walk cuts short rather than buffering it.
  */
object Tar {

  final case class Entry(
      name: String,
      size: Long,
      typeflag: Char, // '0' file, '5' directory, '2' symlink, ...
      mtime: Long,
      data_offset: Long)

  private def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 &&
      (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

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

  private def checksumOk(h: Array[Byte]): Boolean = {
    val stored = octal(h, 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xFF)
      i += 1
    }
    sum == stored
  }

  /** Read exactly `len` bytes into `buf`; false on EOF before that. */
  private def readFully(in: java.io.InputStream, buf: Array[Byte], len: Int): Boolean = {
    var got = 0
    while (got < len) {
      val n = in.read(buf, got, len - got)
      if (n < 0) return false
      got += n
    }
    true
  }

  /** Skip exactly `n` bytes (decompress-and-discard on a gzip stream);
    * false on EOF before that.
    */
  private def skipFully(in: java.io.InputStream, n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() < 0) return false // skip() stalled: probe EOF
      else left -= 1
    }
    true
  }

  /** Single-pass streaming member walk. Yields every structurally-valid
    * member in order; `want` decides whether a member's bytes are
    * materialized (at most one wanted member is in memory at a time) or
    * skipped through the window. Unwanted / oversized (≥2 GiB) members
    * yield an empty array. All malformation — bad checksum, zero block,
    * truncation, corrupt gzip — cuts the walk short, never throws.
    */
  private[graft] def walk(raw: Array[Byte],
      want: Entry => Boolean): Iterator[(Entry, Array[Byte])] =
    new Iterator[(Entry, Array[Byte])] {
      private val in: java.io.InputStream =
        try {
          // [[Codecs.stream]] routes by magic: gzip/zstd/xz/bzip2 inflate
          // in bounded windows; anything else passes through untouched
          if (raw == null) null else Codecs.stream(raw)
        } catch { case scala.util.control.NonFatal(_) => null }
      private val hdr = new Array[Byte](512)
      private var off = 0L // running offset in the (inflated) archive
      private var done = in == null
      private var pending: (Entry, Array[Byte]) = null
      // overrides declared by a preceding 'L' / 'x' meta member
      private var nextName: String = null
      private var nextSize: Long = -1L

      private def advance(): Unit =
        try {
          while (pending == null && !done) {
            if (!readFully(in, hdr, 512)) { done = true; return }
            if (hdr(0) == 0) { done = true; return } // zero block: end
            if (!checksumOk(hdr)) { done = true; return }
            val prefix = str(hdr, 345, 155)
            val name0 = str(hdr, 0, 100)
            val hdrName = if (prefix.nonEmpty) prefix + "/" + name0 else name0
            val hdrSize = octal(hdr, 124, 12)
            val tf = { val c = hdr(156).toChar; if (c == 0) '0' else c }
            if (hdrSize < 0) { done = true; return }
            if (tf == 'L' || tf == 'x' || tf == 'g') {
              // meta member: its data describes the NEXT member ('g'
              // skipped — global defaults are out of envelope)
              if (hdrSize > (1L << 20)) { done = true; return }
              val d = new Array[Byte](hdrSize.toInt)
              if (!readFully(in, d, d.length)) { done = true; return }
              if (tf == 'L') nextName = str(d, 0, d.length)
              else if (tf == 'x') {
                val pax = parsePax(d)
                pax.get("path").foreach(nextName = _)
                pax.get("size").foreach { v =>
                  try nextSize = v.trim.toLong
                  catch { case _: NumberFormatException => done = true; return }
                }
              }
              val padded = ((hdrSize + 511) / 512) * 512
              off += 512 + padded
              if (!skipFully(in, padded - hdrSize)) { done = true; return }
            } else {
              val name = if (nextName != null) nextName else hdrName
              val size = if (nextSize >= 0) nextSize else hdrSize
              nextName = null; nextSize = -1L
              if (size < 0) { done = true; return }
              val e = Entry(name, size, tf, octal(hdr, 136, 12), off + 512L)
              val data: Array[Byte] =
                if (size > 0 && size <= Int.MaxValue - 16L && want(e)) {
                  val d = new Array[Byte](size.toInt)
                  if (!readFully(in, d, d.length)) { done = true; return }
                  d
                } else {
                  if (!skipFully(in, size)) { done = true; return }
                  Array.emptyByteArray
                }
              // the member is complete once its data is; short PADDING
              // still emits it and the next header read ends the walk
              val padded = ((size + 511) / 512) * 512
              off += 512 + padded
              pending = (e, data)
              if (!skipFully(in, padded - size)) done = true
            }
          }
        } catch { case scala.util.control.NonFatal(_) => done = true }

      def hasNext: Boolean = {
        if (pending == null && !done) advance()
        pending != null
      }
      def next(): (Entry, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException("tar member")
        val r = pending; pending = null; r
      }
    }

  /** pax extended-header records: `LEN key=value\n`, LEN the decimal
    * byte length of the WHOLE record including itself and the newline
    * (POSIX.1-2001). Malformed framing cuts short with the records
    * parsed so far.
    */
  private def parsePax(d: Array[Byte]): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    var ok = true
    while (ok && i < d.length) {
      var j = i
      while (j < d.length && d(j) != ' ') j += 1
      if (j >= d.length) ok = false
      else {
        val len =
          try new String(d, i, j - i, "US-ASCII").toInt
          catch { case _: NumberFormatException => ok = false; 0 }
        if (!ok || len <= 0 || i + len > d.length || d(i + len - 1) != '\n')
          ok = false
        else {
          val rec = new String(d, j + 1, i + len - 1 - (j + 1), "UTF-8")
          val eq = rec.indexOf('=')
          if (eq > 0) out(rec.substring(0, eq)) = rec.substring(eq + 1)
          i += len
        }
      }
    }
    out.toMap
  }

  /** Member listing over a `.tar` or `.tar.gz` payload — one streaming
    * pass, no member data materialized. Offsets refer to the (inflated)
    * archive bytes.
    */
  def entries(raw: Array[Byte]): Seq[Entry] =
    walk(raw, _ => false).map(_._1).toSeq

  /** One member's bytes by name ('.tar' or '.tar.gz' payload) — a
    * streaming pass that stops inflating at the match, buffering only
    * that member.
    */
  def read(raw: Array[Byte], name: String): Option[Array[Byte]] = {
    val it = walk(raw, e => e.name == name && e.typeflag == '0')
      .collectFirst {
        case (e, d) if e.name == name && e.typeflag == '0' &&
          d.length.toLong == e.size => d
      }
    it
  }

  /** One 512-byte ustar header with a valid checksum — shared by
    * [[build]] and the spec/soak fixture writers.
    */
  private[graft] def header(name: String, size: Long, tf: Char,
      mtime: Long = 1755000000L): Array[Byte] = {
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
    oct(124, 12, size)
    oct(136, 12, mtime)
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
    h
  }

  /** Assemble a tar (optionally gzipped) from (name, bytes, typeflag)
    * members — the spec/certificate builders' counterpart.
    */
  private[graft] def build(members: Seq[(String, Array[Byte], Char)],
      gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data, tf) <- members) {
      out.write(header(name, data.length, tf))
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
