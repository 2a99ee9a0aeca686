package graft.ext

/** Outlook `.msg` extraction ([MS-OXMSG]) — the format corporate mail
  * exports and e-discovery dumps arrive in, and a pure property walk
  * over the [[Cfb]] container: every MAPI property is a stream named
  * `__substg1.0_PPPPTTTT` (PPPP = property id, TTTT = type: 001F
  * UTF-16LE string, 001E 8-bit string, 0102 binary); recipients and
  * attachments are sub-storages (`__recip_version1.0_#NNNNNNNN`,
  * `__attach_version1.0_#NNNNNNNN`) holding the same shape one level
  * down. Fixed-width properties live in `__properties_version1.0` —
  * outside the envelope (the string/binary layer carries the text a
  * curation pipeline wants).
  *
  * Scale shape: one message = one payload row, map-only on executors.
  */
object Msg {

  final case class Attachment(filename: String, bytes: Array[Byte])

  final case class MsgData(subject: String, senderName: String, body: String,
      recipients: Vector[(String, String)], // (display name, email)
      attachments: Vector[Attachment])

  /** None when the payload is not a CFB or carries no .msg property
    * streams at all.
    */
  def parse(b: Array[Byte]): Option[MsgData] = {
    val es = Cfb.entries(b).getOrElse(return None)
    val streams = es.filter(_.objType == 2).map(_.path)
    if (!streams.exists(_.startsWith("__substg1.0_"))) return None

    def str(prefix: String, prop: String): String =
      Cfb.read(b, prefix + "__substg1.0_" + prop + "001F")
        .map(new String(_, "UTF-16LE"))
        .orElse(Cfb.read(b, prefix + "__substg1.0_" + prop + "001E")
          .map(new String(_, java.nio.charset.StandardCharsets.ISO_8859_1)))
        .getOrElse("")

    val recips = streams.collect {
      case p if p.startsWith("__recip_version1.0_#") && p.contains("/") =>
        p.substring(0, p.indexOf('/') + 1)
    }.distinct.sorted.map { pre =>
      (str(pre, "3001"), {
        val smtp = str(pre, "39FE")
        if (smtp.nonEmpty) smtp else str(pre, "3003")
      })
    }

    val attachments = streams.collect {
      case p if p.startsWith("__attach_version1.0_#") && p.contains("/") =>
        p.substring(0, p.indexOf('/') + 1)
    }.distinct.sorted.flatMap { pre =>
      Cfb.read(b, s"${pre}__substg1.0_37010102").map { data =>
        val name = {
          val long = str(pre, "3707")
          if (long.nonEmpty) long else str(pre, "3704")
        }
        Attachment(name, data)
      }
    }

    // body resolution: the plain-text property when present, else the
    // compressed-RTF body (PR_RTF_COMPRESSED — what real Outlook
    // stores) through [[Lzfu]] + the RTF tokenizer
    val body = {
      val plain = str("", "1000")
      if (plain.nonEmpty) plain
      else Cfb.read(b, "__substg1.0_10090102")
        .flatMap(Lzfu.decompress)
        .flatMap(Rtf.text)
        .getOrElse("")
    }
    Some(MsgData(str("", "0037"), str("", "0C1A"), body,
      recips, attachments))
  }

  /** Deterministic .msg builder for certificates/specs — the property
    * streams exactly as Outlook lays them out.
    */
  private[graft] def build(subject: String, sender: String, body: String,
      recipients: Seq[(String, String)],
      attachments: Seq[(String, Array[Byte])],
      rtfBodyOnly: Boolean = false): Array[Byte] = {
    def u(s: String) = s.getBytes("UTF-16LE")
    val bodyStream =
      if (rtfBodyOnly)
        ("__substg1.0_10090102",
          Lzfu.compress(Rtf.build(body).getBytes("US-ASCII")))
      else ("__substg1.0_1000001F", u(body))
    val base = Seq(
      ("__substg1.0_0037001F", u(subject)),
      ("__substg1.0_0C1A001F", u(sender)),
      bodyStream)
    val rs = recipients.zipWithIndex.flatMap { case ((name, email), k) =>
      val pre = f"__recip_version1.0_#$k%08X/"
      Seq((pre + "__substg1.0_3001001F", u(name)),
        (pre + "__substg1.0_39FE001F", u(email)))
    }
    val as = attachments.zipWithIndex.flatMap { case ((name, data), k) =>
      val pre = f"__attach_version1.0_#$k%08X/"
      Seq((pre + "__substg1.0_3707001F", u(name)),
        (pre + "__substg1.0_37010102", data))
    }
    Cfb.build(base ++ rs ++ as)
  }
}
