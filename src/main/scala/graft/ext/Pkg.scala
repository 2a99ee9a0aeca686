package graft.ext

/** Software-distribution containers — the shapes a code/package crawl
  * lands in row-scale blobs:
  *
  *   - **ar** (`!<arch>\n` magic, fixed 60-byte ASCII headers): the
  *     OUTER container of Debian/Ubuntu `.deb` packages and of static
  *     libraries (`.a`). GNU long names (`//` string table + `/N`
  *     references) and BSD inline names (`#1/N`) are handled by the
  *     commons-compress reader this walk rides on.
  *   - **cpio** ASCII dialects (`070701` newc / `070702` newc+CRC /
  *     `070707` odc): RPM payloads, initramfs images, kernel build
  *     artifacts.
  *   - **.deb composition**: `debian-binary` + `control.tar.<c>` +
  *     `data.tar.<c>` ar members, where `<c>` rotates across gzip /
  *     xz / zstd / bzip2 in the wild — each routes through
  *     [[Codecs.stream]] by MAGIC (never by file extension) and then
  *     the [[Tar]] walk.
  *
  * Like every container arm here ([[Zip]], [[Tar]], [[SevenZ]]): pure
  * byte-array in / byte-array out inside a map task, no filesystem;
  * malformed input yields Nil/None, never a throw; one blob per row
  * caps members at ~2 GiB by construction (the streaming path for
  * bigger-than-row archives is [[Tar.walk]]'s discipline, not this).
  *
  * Reference analog: the byte-stream stage contract
  * (/root/reference/index.js:14-27) — any package a shell stage could
  * `dpkg-deb -x` / `cpio -i`, the engine decodes natively.
  */
object Pkg {

  final case class Entry(name: String, size: Long)

  // ------------------------------------------------------------------ ar

  def isAr(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && new String(b, 0, 8, "US-ASCII") == "!<arch>\n"

  private def arStream(b: Array[Byte]) =
    new org.apache.commons.compress.archivers.ar.ArArchiveInputStream(
      new java.io.ByteArrayInputStream(b))

  def arEntries(b: Array[Byte]): Seq[Entry] = {
    if (!isAr(b)) return Nil
    try {
      val in = arStream(b)
      try Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .map(e => Entry(e.getName, e.getSize)).toList
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  def arRead(b: Array[Byte], name: String): Option[Array[Byte]] = {
    if (!isAr(b)) return None
    try {
      val in = arStream(b)
      try {
        var e = in.getNextEntry
        while (e != null) {
          if (e.getName == name) {
            if (e.getSize < 0 || e.getSize > Int.MaxValue) return None
            val out = new Array[Byte](e.getSize.toInt)
            var got = 0
            while (got < out.length) {
              val m = in.read(out, got, out.length - got)
              if (m < 0) return None // truncated member
              got += m
            }
            return Some(out)
          }
          e = in.getNextEntry
        }
        None
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Assemble an ar archive — fixture builder (ar is also how .deb
    * fixtures are composed, see [[debBuild]]).
    */
  private[graft] def arBuild(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.archivers.ar.ArArchiveOutputStream(bos)
    // names past ar's 16-byte field get BSD #1/N inline encoding (the
    // default mode ERRORS instead; .deb member names all fit, but the
    // builder shouldn't be narrower than the reader)
    out.setLongFileMode(org.apache.commons.compress.archivers.ar
      .ArArchiveOutputStream.LONGFILE_BSD)
    for ((name, data) <- members) {
      out.putArchiveEntry(
        new org.apache.commons.compress.archivers.ar.ArArchiveEntry(
          name, data.length.toLong, 0, 0, Integer.parseInt("100644", 8),
          0L)) // deterministic mtime: certificates rebuild hash-stably
      out.write(data)
      out.closeArchiveEntry()
    }
    out.finish(); out.close()
    bos.toByteArray
  }

  // ---------------------------------------------------------------- cpio

  /** ASCII dialects only ("070701" newc, "070702" newc+CRC, "070707"
    * odc). The old BINARY dialect (2-byte 070707) is out of envelope by
    * documented intent — its byte order is host-defined and modern
    * payloads don't ship it.
    */
  def isCpio(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && {
      val m = new String(b, 0, 6, "US-ASCII")
      m == "070701" || m == "070702" || m == "070707"
    }

  private def cpioStream(b: Array[Byte]) =
    new org.apache.commons.compress.archivers.cpio.CpioArchiveInputStream(
      new java.io.ByteArrayInputStream(b))

  def cpioEntries(b: Array[Byte]): Seq[Entry] = {
    if (!isCpio(b)) return Nil
    try {
      val in = cpioStream(b)
      try Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .filter(_.getName != "TRAILER!!!")
        .map(e => Entry(e.getName, e.getSize)).toList
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  def cpioRead(b: Array[Byte], name: String): Option[Array[Byte]] = {
    if (!isCpio(b)) return None
    try {
      val in = cpioStream(b)
      try {
        var e = in.getNextEntry
        while (e != null) {
          if (e.getName == name) {
            if (e.getSize < 0 || e.getSize > Int.MaxValue) return None
            val out = new Array[Byte](e.getSize.toInt)
            var got = 0
            while (got < out.length) {
              val m = in.read(out, got, out.length - got)
              if (m < 0) return None
              got += m
            }
            // the 070702 dialect carries a per-entry byte-sum checksum;
            // the commons-compress reader PARSES but does not verify it
            // (measured: a flipped data byte read back clean) — verify
            // here so tampering is a None, not silent garbage
            if (e.getFormat ==
                org.apache.commons.compress.archivers.cpio.CpioConstants.FORMAT_NEW_CRC) {
              var sum = 0L
              out.foreach(x => sum += (x & 0xFF))
              if ((sum & 0xFFFFFFFFL) != e.getChksum) return None
            }
            return Some(out)
          }
          e = in.getNextEntry
        }
        None
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Assemble a cpio archive in the given ASCII dialect
    * ("newc" | "crc" | "odc") — fixture builder.
    */
  private[graft] def cpioBuild(members: Seq[(String, Array[Byte])],
      dialect: String = "newc"): Array[Byte] = {
    import org.apache.commons.compress.archivers.cpio.{
      CpioArchiveEntry, CpioArchiveOutputStream, CpioConstants}
    val fmt = dialect match {
      case "newc" => CpioConstants.FORMAT_NEW
      case "crc"  => CpioConstants.FORMAT_NEW_CRC
      case "odc"  => CpioConstants.FORMAT_OLD_ASCII
      case d => throw new IllegalArgumentException(s"cpio dialect $d")
    }
    val bos = new java.io.ByteArrayOutputStream()
    val out = new CpioArchiveOutputStream(bos, fmt)
    for ((name, data) <- members) {
      val e = new CpioArchiveEntry(fmt, name, data.length.toLong)
      e.setTime(0L) // deterministic
      if (fmt == CpioConstants.FORMAT_NEW_CRC) {
        var sum = 0L
        data.foreach(x => sum += (x & 0xFF))
        e.setChksum(sum & 0xFFFFFFFFL)
      }
      out.putArchiveEntry(e)
      out.write(data)
      out.closeArchiveEntry()
    }
    out.finish(); out.close()
    bos.toByteArray
  }

  // ---------------------------------------------------------------- .deb

  /** List a .deb's DATA tar members: find the `data.tar*` ar member,
    * route its bytes through [[Codecs.stream]] by magic (gz/xz/zst/bz2
    * — or none), walk the tar. Nil when the blob is not a deb.
    */
  def debDataEntries(b: Array[Byte]): Seq[Tar.Entry] =
    debDataTar(b).map(Tar.entries).getOrElse(Nil)

  /** One file's bytes out of the .deb data tree (tar-style path, e.g.
    * `./usr/share/doc/pkg/readme`).
    */
  def debDataRead(b: Array[Byte], path: String): Option[Array[Byte]] =
    debDataTar(b).flatMap(Tar.read(_, path))

  /** The `control` file's text (from control.tar.<c>) — package
    * metadata in RFC-822-ish fields.
    */
  def debControl(b: Array[Byte]): Option[String] =
    arEntries(b).map(_.name).find(_.startsWith("control.tar"))
      .flatMap(arRead(b, _))
      .map(Codecs.decompress(_))
      .flatMap(t => Tar.read(t, "./control").orElse(Tar.read(t, "control")))
      .map(new String(_, "UTF-8"))

  private def debDataTar(b: Array[Byte]): Option[Array[Byte]] =
    arEntries(b).map(_.name).find(_.startsWith("data.tar"))
      .flatMap(arRead(b, _))
      .map(Codecs.decompress(_)) // record-scale: the ≤2 GiB in-row cap

  /** Assemble a .deb (fixture builder): debian-binary 2.0, gzip'd
    * control tar, data tar in the requested codec (gzip/xz/zstd/bzip2
    * — the rotation real archives ship).
    */
  private[graft] def debBuild(control: String,
      dataMembers: Seq[(String, Array[Byte])],
      dataCodec: String = "xz"): Array[Byte] = {
    val controlTar = Tar.build(Seq(("./control", control.getBytes("UTF-8"), '0')))
    val dataTar = Tar.build(
      dataMembers.map { case (n, d) => (n, d, '0') })
    val dataComp = dataCodec match {
      case "gzip"  => Codecs.gzip(dataTar)
      case "xz"    => Codecs.xz(dataTar)
      case "zstd"  => Codecs.zstd(dataTar)
      case "bzip2" => Codecs.bzip2(dataTar)
      case "none"  => dataTar
      case c => throw new IllegalArgumentException(s"deb data codec $c")
    }
    val ext = dataCodec match {
      case "gzip" => ".gz"; case "xz" => ".xz"; case "zstd" => ".zst"
      case "bzip2" => ".bz2"; case _ => ""
    }
    arBuild(Seq(
      ("debian-binary", "2.0\n".getBytes("US-ASCII")),
      ("control.tar.gz", Codecs.gzip(controlTar)),
      (s"data.tar$ext", dataComp)))
  }
}
