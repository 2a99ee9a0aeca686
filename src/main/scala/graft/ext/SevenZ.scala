package graft.ext

import org.apache.commons.compress.archivers.sevenz.{
  SevenZArchiveEntry, SevenZFile, SevenZOutputFile}
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel

/** 7z archive walk — the remaining compression-family magic the sniff
  * names ([[Multimodal.sniffFormat]] `"7z"`) that scraped document
  * dumps and software mirrors ship. Decoding rides the commons-compress
  * `SevenZFile` already on the Spark classpath over an in-memory
  * seekable channel (7z's end-of-file header DEMANDS a seekable source,
  * unlike the stream codecs in [[Codecs]] — which is why this is its
  * own arm and not a `Codecs.stream` route).
  *
  * Scale shape: per-row byte arrays inside tasks, same as [[Zip]] —
  * the channel wraps the blob with zero copy, headers parse from the
  * tail, and only explicitly `read` members materialize. AES-256
  * protected archives open with the password column; without it,
  * listing still works (7z encrypts content, not the header, unless
  * header encryption was chosen) and reads gate out as None — never a
  * throw (cut-short contract, uniform with every parser arm).
  */
object SevenZ {

  final case class Entry(name: String, size: Long, is_dir: Boolean)

  private def open(raw: Array[Byte], password: Option[String]): Option[SevenZFile] =
    try {
      if (raw == null || raw.length < 32) None
      else {
        val b = SevenZFile.builder()
          .setSeekableByteChannel(new SeekableInMemoryByteChannel(raw))
        password.foreach(b.setPassword)
        Some(b.get())
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Member listing — names, uncompressed sizes, directory flags. */
  def entries(raw: Array[Byte]): Seq[Entry] = open(raw, None) match {
    case None => Nil
    case Some(f) =>
      try {
        val out = Seq.newBuilder[Entry]
        var e = f.getNextEntry
        while (e != null) {
          out += Entry(e.getName, e.getSize, e.isDirectory)
          e = f.getNextEntry
        }
        out.result()
      } catch { case scala.util.control.NonFatal(_) => Nil }
      finally f.close()
  }

  /** One member's bytes by name; None when missing, oversized (≥2 GiB),
    * password-protected without the password, or structurally damaged.
    */
  def read(raw: Array[Byte], name: String,
      password: Option[String] = None): Option[Array[Byte]] =
    open(raw, password) match {
      case None => None
      case Some(f) =>
        try {
          var e = f.getNextEntry
          while (e != null) {
            if (e.getName == name && !e.isDirectory) {
              val sz = e.getSize
              if (sz < 0 || sz > Int.MaxValue - 16L) return None
              val buf = new Array[Byte](sz.toInt)
              var got = 0
              while (got < buf.length) {
                val n = f.read(buf, got, buf.length - got)
                if (n < 0) return None
                got += n
              }
              return Some(buf)
            }
            e = f.getNextEntry
          }
          None
        } catch { case scala.util.control.NonFatal(_) => None }
        finally f.close()
    }

  /** Assemble a 7z archive (LZMA2; AES-256 when a password is given) —
    * the spec/certificate fixture builder.
    */
  private[graft] def build(members: Seq[(String, Array[Byte])],
      password: Option[String] = None): Array[Byte] = {
    val ch = new SeekableInMemoryByteChannel()
    val out = password match {
      case Some(p) => new SevenZOutputFile(ch, p.toCharArray)
      case None    => new SevenZOutputFile(ch)
    }
    // LZMA2 with the dictionary sized to the largest member instead of
    // the 8 MiB default — ~90 MB of encoder state per fixture archive
    // otherwise (the q_7z_extract 13.5 s bench spike; see Codecs.lzmaOpts).
    // The password path must keep AES256SHA256 in the method CHAIN, or
    // overriding would silently ship the "encrypted" fixture in plaintext.
    val maxLen = members.foldLeft(1) { case (m, (_, d)) => math.max(m, d.length) }
    val lzma2 =
      new org.apache.commons.compress.archivers.sevenz.SevenZMethodConfiguration(
        org.apache.commons.compress.archivers.sevenz.SevenZMethod.LZMA2,
        graft.ext.Codecs.lzmaOpts(maxLen))
    // encrypted archives keep the password constructor's default chain:
    // the AES coder's AES256Options (which carries the key material) is
    // package-private, so a replacement chain cannot re-attach it — and
    // a bare AES method constant NPEs in the encoder. Only the
    // unencrypted fixture path (the per-row certificate query) needs
    // the allocation fix.
    if (password.isEmpty) out.setContentMethods(java.util.Arrays.asList(lzma2))
    try {
      for ((name, data) <- members) {
        val e = new SevenZArchiveEntry()
        e.setName(name)
        e.setDirectory(false)
        out.putArchiveEntry(e)
        out.write(data)
        out.closeArchiveEntry()
      }
      out.finish()
    } finally out.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }
}
