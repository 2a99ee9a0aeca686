package graft.ext

/** ZIP container walk (PKWARE APPNOTE layout) — pure `java.util.zip`
  * primitives, no filesystem: crawled archives and, more importantly,
  * the OOXML/ODF office-document family (`.docx`/`.xlsx`/`.odt` are ZIP
  * containers) arrive as in-row binary payloads, so the walk must work
  * on byte arrays inside a map task, not on local files (the JDK's
  * `ZipFile` wants a `File`; `ZipInputStream` trusts local headers,
  * which real-world writers get wrong — the central directory is the
  * authority, and that is what this walk reads).
  *
  * Structure parsed:
  *   - End-of-central-directory (PK\x05\x06) found by backward scan
  *     over the trailing 64 KiB + 22 (archive comments are legal).
  *   - Central directory entries (PK\x01\x02): name, method, CRC,
  *     compressed/uncompressed sizes, local-header offset.
  *   - [[read]] seeks the LOCAL header (PK\x03\x04) and inflates method
  *     8 (raw `Inflater(true)`) or copies method 0 (stored); the result
  *     is CRC-verified against the central directory before it is
  *     returned — a corrupt member yields None, never silent garbage.
  *
  *   - ZIP64 (APPNOTE §4.3.14-15, routine at crawl scale and emitted by
  *     many writers regardless of size): the EOCD64 locator (PK\x06\x07)
  *     and record (PK\x06\x06) override masked EOCD fields (0xFFFF
  *     entry counts, 0xFFFFFFFF central-directory offset), and masked
  *     central-directory sizes/offsets resolve through the 0x0001 extra
  *     field in APPNOTE order (uncompressed, compressed, local offset).
  *
  *   - Traditional PKWARE encryption ("ZipCrypto", APPNOTE §6.1 — the
  *     12-byte header + three-register LCG/CRC keystream that password-
  *     protected archives in scraped document dumps overwhelmingly
  *     use): members flagged bit 0 decrypt through [[read]]'s password
  *     overload, with the header's check byte vetting the password
  *     BEFORE any inflate runs; without (or with a wrong) password the
  *     member gates out as None while the listing still works.
  *
  * Out of envelope, by documented intent: AES-extra-field (0x9901)
  * encryption and split/spanned archives; and since a blob column lands one archive
  * per row as a single JVM array, the archive itself and any EXTRACTED
  * member cap at ~2 GiB — Zip64 structures beyond that parse correctly
  * (entries list with true 64-bit sizes) but such members read as None.
  * All reads bounds-checked; malformed payloads yield Nil/None, never
  * a throw.
  */
object Zip {

  final case class Entry(
      name: String,
      method: Int,
      comp_size: Long,
      uncomp_size: Long,
      crc: Long,
      local_offset: Long,
      encrypted: Boolean = false)

  /** PKWARE traditional cipher (APPNOTE §6.1): three 32-bit key
    * registers driven by a CRC32 table and the 134775813 LCG; one
    * keystream byte per data byte. Symmetric — [[Keys.decrypt]] and
    * [[Keys.encrypt]] share the register update on the PLAIN byte.
    */
  private object ZipCrypto {
    val crcTab: Array[Int] = Array.tabulate(256) { n =>
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      c
    }
    final class Keys(password: Array[Byte]) {
      private var k0 = 0x12345678
      private var k1 = 0x23456789
      private var k2 = 0x34567890
      password.foreach(update)
      private def crc1(c: Int, b: Byte): Int = (c >>> 8) ^ crcTab((c ^ b) & 0xFF)
      private def update(p: Byte): Unit = {
        k0 = crc1(k0, p)
        k1 = (k1 + (k0 & 0xFF)) * 134775813 + 1
        k2 = crc1(k2, (k1 >>> 24).toByte)
      }
      private def streamByte: Int = {
        val t = (k2 | 2) & 0xFFFF
        ((t * (t ^ 1)) >>> 8) & 0xFF
      }
      def decrypt(c: Byte): Byte = {
        val p = ((c & 0xFF) ^ streamByte).toByte
        update(p); p
      }
      def encrypt(p: Byte): Byte = {
        val c = ((p & 0xFF) ^ streamByte).toByte
        update(p); c
      }
    }
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  /** Central-directory listing. Nil when no EOCD record is found. */
  def entries(b: Array[Byte]): Seq[Entry] = {
    if (b == null || b.length < 22) return Nil
    try {
      // EOCD: backward scan (trailing comment allowed, max 64 KiB)
      var eocd = -1
      var i = b.length - 22
      val stop = math.max(0, b.length - 22 - 65535)
      while (eocd < 0 && i >= stop) {
        if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)
          eocd = i
        i -= 1
      }
      if (eocd < 0) return Nil
      var n = le16(b, eocd + 10).toLong
      var cdOff = le32(b, eocd + 16)
      // ZIP64: masked EOCD fields resolve through the EOCD64 locator
      // (immediately before the EOCD) and the EOCD64 record it points at
      if (n == 0xFFFFL || cdOff == 0xFFFFFFFFL) {
        val loc = eocd - 20
        if (loc >= 0 && b(loc) == 'P' && b(loc + 1) == 'K' &&
            b(loc + 2) == 6 && b(loc + 3) == 7) {
          val e64 = le64(b, loc + 8)
          if (e64 >= 0 && e64 + 56 <= b.length && e64 <= Int.MaxValue.toLong &&
              b(e64.toInt) == 'P' && b(e64.toInt + 1) == 'K' &&
              b(e64.toInt + 2) == 6 && b(e64.toInt + 3) == 6) {
            val q = e64.toInt
            n = le64(b, q + 32) // total entries
            cdOff = le64(b, q + 48)
          }
        }
      }
      if (cdOff < 0 || cdOff >= b.length) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
      var p = cdOff.toInt
      var k = 0L
      while (k < n && p + 46 <= b.length &&
          b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 1 && b(p + 3) == 2) {
        val flags = le16(b, p + 8)
        val method = le16(b, p + 10)
        val crc = le32(b, p + 16)
        var compSize = le32(b, p + 20)
        var uncompSize = le32(b, p + 24)
        val nameLen = le16(b, p + 28)
        val extraLen = le16(b, p + 30)
        val commentLen = le16(b, p + 32)
        var localOff = le32(b, p + 42)
        if (p + 46 + nameLen > b.length) return out.toSeq
        val name = new String(b, p + 46, nameLen, "UTF-8")
        // masked 32-bit fields resolve through the 0x0001 (ZIP64) extra
        // field, values in APPNOTE order for the fields that are masked
        if ((compSize == 0xFFFFFFFFL || uncompSize == 0xFFFFFFFFL ||
            localOff == 0xFFFFFFFFL) && extraLen > 0) {
          var x = p + 46 + nameLen
          val xEnd = math.min(x + extraLen, b.length - 4)
          var found = false
          while (!found && x + 4 <= xEnd) {
            val id = le16(b, x)
            val sz = le16(b, x + 2)
            if (id == 0x0001 && x + 4 + sz <= b.length) {
              var v = x + 4
              if (uncompSize == 0xFFFFFFFFL && v + 8 <= x + 4 + sz) {
                uncompSize = le64(b, v); v += 8
              }
              if (compSize == 0xFFFFFFFFL && v + 8 <= x + 4 + sz) {
                compSize = le64(b, v); v += 8
              }
              if (localOff == 0xFFFFFFFFL && v + 8 <= x + 4 + sz) {
                localOff = le64(b, v); v += 8
              }
              found = true
            } else x += 4 + sz
          }
        }
        out += Entry(name, method, compSize, uncompSize, crc, localOff,
          encrypted = (flags & 0x0001) != 0)
        p += 46 + nameLen + extraLen + commentLen
        k += 1
      }
      out.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** A member's decompressed bytes, CRC-verified. None for a missing
    * name, unsupported method, a ZipCrypto member without (or with a
    * wrong) password, or any corruption.
    */
  def read(b: Array[Byte], name: String,
      password: Option[String] = None): Option[Array[Byte]] =
    entries(b).find(_.name == name).flatMap(readEntry(b, _, password))

  def readEntry(b: Array[Byte], e: Entry,
      password: Option[String] = None): Option[Array[Byte]] = {
    try {
      // 64-bit offsets beyond the (≤2 GiB) array are unreadable by
      // construction — guard BEFORE the narrowing, toInt wraps
      if (e.local_offset < 0 || e.local_offset + 30 > b.length) return None
      val p = e.local_offset.toInt
      if (p < 0 || p + 30 > b.length ||
          !(b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 3 && b(p + 3) == 4))
        return None
      // local name/extra lengths are the authority for the data offset
      val nameLen = le16(b, p + 26)
      val extraLen = le16(b, p + 28)
      val data = p + 30 + nameLen + extraLen
      if (e.comp_size < 0 || e.comp_size > Int.MaxValue ||
          data + e.comp_size > b.length) return None
      // ZipCrypto: a 12-byte encryption header precedes the compressed
      // data; its LAST decrypted byte must equal crc>>24 (the password
      // check APPNOTE mandates) — vetted BEFORE any inflate touches the
      // keystream output, so a wrong password is a cheap None
      val (src, srcOff, srcLen) =
        if (!e.encrypted) (b, data, e.comp_size.toInt)
        else password match {
          case None => return None // gate out: protected, no password
          case Some(pw) =>
            if (e.comp_size < 12) return None
            val keys = new ZipCrypto.Keys(pw.getBytes("ISO-8859-1"))
            var check = 0
            var i = 0
            while (i < 12) { check = keys.decrypt(b(data + i)) & 0xFF; i += 1 }
            if (check != ((e.crc >>> 24) & 0xFF)) return None
            val dec = new Array[Byte](e.comp_size.toInt - 12)
            var j = 0
            while (j < dec.length) { dec(j) = keys.decrypt(b(data + 12 + j)); j += 1 }
            (dec, 0, dec.length)
        }
      val raw = e.method match {
        case 0 =>
          if (srcLen.toLong != e.uncomp_size) return None
          java.util.Arrays.copyOfRange(src, srcOff, srcOff + srcLen)
        case 8 =>
          if (e.uncomp_size < 0 || e.uncomp_size > Int.MaxValue) return None
          val inf = new java.util.zip.Inflater(true) // raw deflate
          try {
            inf.setInput(src, srcOff, srcLen)
            val out = new Array[Byte](e.uncomp_size.toInt)
            var got = 0
            while (got < out.length && !inf.finished()) {
              val m = inf.inflate(out, got, out.length - got)
              if (m == 0 && inf.needsInput()) return None // truncated
              got += m
            }
            if (got != out.length) return None
            out
          } finally inf.end()
        case _ => return None // unsupported method
      }
      val crc = new java.util.zip.CRC32
      crc.update(raw)
      if (crc.getValue != e.crc) None else Some(raw)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Assemble a ZIP from (name, bytes, deflate?) members — the
    * spec/certificate builders' counterpart of the walk (local headers,
    * central directory, EOCD; raw Deflater for method 8). With
    * `zip64 = true` the archive is written the way crawl-scale writers
    * emit it regardless of size: central sizes/offsets masked to
    * 0xFFFFFFFF with a 0x0001 extra field carrying the 64-bit values,
    * a masked EOCD, and the EOCD64 record + locator (version 4.5).
    */
  private[graft] def build(members: Seq[(String, Array[Byte], Boolean)],
      zip64: Boolean = false,
      password: Option[String] = None): Array[Byte] = {
    val flagBits = if (password.isDefined) 0x0001 else 0
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >>> 8) & 0xFF).toInt)
      out.write(((v >>> 16) & 0xFF).toInt); out.write(((v >>> 24) & 0xFF).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32(v >>> 32) }
    val cds = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Long, Long, Long)]
    for ((name, raw, deflate) <- members) {
      val crc = new java.util.zip.CRC32
      crc.update(raw)
      val comp0 =
        if (!deflate) raw
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(raw); d.finish()
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
            buf.toByteArray
          } finally d.end()
        }
      val comp = password match {
        case None => comp0
        case Some(pw) =>
          // 12-byte encryption header: 11 filler bytes (deterministic
          // here — certificates must hash-stably rebuild) + the crc>>24
          // check byte, all encrypted, then the keystream continues over
          // the compressed data
          val keys = new ZipCrypto.Keys(pw.getBytes("ISO-8859-1"))
          val enc = new Array[Byte](12 + comp0.length)
          var i = 0
          while (i < 11) {
            enc(i) = keys.encrypt(
              ((crc.getValue >>> ((i % 4) * 8)) + i * 97 + name.length).toByte)
            i += 1
          }
          enc(11) = keys.encrypt(((crc.getValue >>> 24) & 0xFF).toByte)
          var j = 0
          while (j < comp0.length) { enc(12 + j) = keys.encrypt(comp0(j)); j += 1 }
          enc
      }
      val off = out.size().toLong
      val nameB = name.getBytes("UTF-8")
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(flagBits); w16(if (deflate) 8 else 0); w16(0); w16(0)
      w32(crc.getValue); w32(comp.length); w32(raw.length)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      cds += ((name, if (deflate) 8 else 0, crc.getValue,
        comp.length.toLong, raw.length.toLong, off))
    }
    val cdStart = out.size().toLong
    for ((name, method, crc, compLen, rawLen, off) <- cds) {
      val nameB = name.getBytes("UTF-8")
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      if (zip64) {
        // version 4.5; sizes and local offset masked into the 0x0001
        // extra field (APPNOTE order: uncompressed, compressed, offset)
        w16(45); w16(45); w16(flagBits); w16(method); w16(0); w16(0)
        w32(crc); w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
        w16(nameB.length); w16(4 + 24); w16(0); w16(0); w16(0)
        w32(0); w32(0xFFFFFFFFL)
        out.write(nameB)
        w16(0x0001); w16(24)
        w64(rawLen); w64(compLen); w64(off)
      } else {
        w16(20); w16(20); w16(flagBits); w16(method); w16(0); w16(0)
        w32(crc); w32(compLen); w32(rawLen)
        w16(nameB.length); w16(0); w16(0); w16(0); w16(0)
        w32(0); w32(off)
        out.write(nameB)
      }
    }
    val cdLen = out.size() - cdStart
    if (zip64) {
      val e64 = out.size().toLong
      out.write('P'); out.write('K'); out.write(6); out.write(6)
      w64(44) // record size, not counting sig+this field
      w16(45); w16(45); w32(0); w32(0)
      w64(cds.length.toLong); w64(cds.length.toLong)
      w64(cdLen.toLong); w64(cdStart)
      out.write('P'); out.write('K'); out.write(6); out.write(7) // locator
      w32(0); w64(e64); w32(1)
      out.write('P'); out.write('K'); out.write(5); out.write(6) // masked EOCD
      w16(0); w16(0); w16(0xFFFF); w16(0xFFFF)
      w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(0)
    } else {
      out.write('P'); out.write('K'); out.write(5); out.write(6)
      w16(0); w16(0); w16(cds.length); w16(cds.length)
      w32(cdLen); w32(cdStart); w16(0)
    }
    out.toByteArray
  }
}
