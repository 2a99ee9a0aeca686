package graft.ops

import org.apache.spark.sql.functions._

import Tables._

/** Document/interchange-format arms added round 12b: the Avro OCF and
  * Arrow IPC row-interchange round-trips, MIME mail (.eml + mbox),
  * EPUB, RTF, ODF (odt/ods), SQLite, MHTML, and the legacy-Office set
  * over the CFB container (.doc piece table, .xls BIFF8, Outlook .msg,
  * .ppt record tree) plus ISO 9660 — each a self-built-fixture
  * certificate in the q_docx_extract/q_pdf_extract mold: the fixture is
  * assembled from the documents table with the real container writer,
  * pushed through the real parser on executors, and the extraction must
  * land byte-exact on a DuckDB closed form. (Feed/calendar/research
  * sidecars live in [[SidecarQueries]].)
  */
object DocFormatQueries {

  private val qAvroRoundtrip = Q(
    "q_avro_roundtrip",
    (s, d) => {
      // Avro OCF round-trip (the q_orc_roundtrip contract for the
      // row-interchange format Spark's classpath supports but its
      // datasource registry doesn't): written per-partition with
      // DataFileWriter (snappy blocks, 1 MiB sync interval), read back
      // through AvroKeyInputFormat — Hadoop splits + sync-marker seek,
      // the 100 TB path where ONE big file fans out across executors.
      // Covers long/string/double/timestamp-micros and the
      // union(null,T) nullability idiom via a planted nullable column.
      val src = orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("prio_opt"))
      val out = s"/tmp/graft_avro_${Tables.corpusTag(d)}"
      graft.ext.Avro.write(src, out)
      graft.ext.Avro.read(s, out).orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderpriority END AS prio_opt
            FROM orders ORDER BY o_orderkey"""),
    "Avro OCF sink -> source round-trip (snappy blocks, timestamp-micros " +
      "+ union-null fidelity), read sync-split parallel through " +
      "AvroKeyInputFormat and hash-checked against the parquet original")

  private val qArrowRoundtrip = Q(
    "q_arrow_roundtrip",
    (s, d) => {
      // Arrow IPC / Feather v2 round-trip — the ML-dataset shard format
      // (HuggingFace datasets, polars) as a first-class sink + source:
      // one file per partition, 4096-row record batches (the read-side
      // memory unit), timestamp-micros and null fidelity.
      val src = orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("prio_opt"))
      val out = s"/tmp/graft_arrow_${Tables.corpusTag(d)}"
      graft.ext.ArrowIpc.write(src, out)
      graft.ext.ArrowIpc.read(s, out).orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   CASE WHEN o_orderkey % 5 = 0 THEN NULL
                        ELSE o_orderpriority END AS prio_opt
            FROM orders ORDER BY o_orderkey"""),
    "Arrow IPC (Feather v2) sink -> source round-trip: per-partition " +
      "files of bounded record batches, timestamp-micros + null " +
      "fidelity, hash-checked against the parquet original")

  private val qEmlExtract = Q(
    "q_eml_extract",
    (s, d) => {
      // MIME certificate: each doc becomes a full multipart/mixed message
      // — a folded Subject carrying TWO adjacent RFC 2047 encoded words
      // (B then Q, whitespace-transparent join), a Q-encoded ISO-8859-1
      // display name in From, a multipart/alternative body whose
      // text/plain leaf is quoted-printable (every '=', newline and
      // non-ASCII byte escaped, 72-col soft breaks) and whose text/html
      // leaf is base64, plus a base64 binary attachment. The parser must
      // unfold, decode words, walk the nested boundaries, pick the plain
      // leaf, and hand the attachment bytes back exactly.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val b64 = java.util.Base64.getEncoder
          val subjB = b64.encodeToString("Résumé ✓ ".getBytes("UTF-8"))
          val att = Array.tabulate(64)(k => ((id * 7 + k * 13) % 256).toByte)
          val html = "<html><body><p>Doc " + id + "</p></body></html>"
          val qp = graft.ext.Mail.encodeQp(text)
          val eml =
            s"""Return-Path: <j@example.org>
               |Subject: =?UTF-8?B?$subjB?=
               | =?UTF-8?Q?doc_$id?=
               |From: =?ISO-8859-1?Q?J=F8rgen?= <j@example.org>
               |Date: Thu, 15 Jan 2026 10:00:00 +0000
               |MIME-Version: 1.0
               |Content-Type: multipart/mixed; boundary="outer$id"
               |
               |preamble is ignored
               |--outer$id
               |Content-Type: multipart/alternative; boundary="inner$id"
               |
               |--inner$id
               |Content-Type: text/plain; charset="utf-8"
               |Content-Transfer-Encoding: quoted-printable
               |
               |$qp
               |--inner$id
               |Content-Type: text/html; charset="utf-8"
               |Content-Transfer-Encoding: base64
               |
               |${b64.encodeToString(html.getBytes("UTF-8"))}
               |--inner$id--
               |--outer$id
               |Content-Type: application/octet-stream; name="blob.bin"
               |Content-Disposition: attachment; filename="blob.bin"
               |Content-Transfer-Encoding: base64
               |
               |${b64.encodeToString(att)}
               |--outer$id--
               |""".stripMargin.replace("\n", "\r\n")
          val m = graft.ext.Mail.parseEml(eml.getBytes("ISO-8859-1"))
          val attSum = m.parts.find(_.filename.contains("blob.bin"))
            .map(_.body.foldLeft(0L)((a, x) => a + (x & 0xFF))).getOrElse(-1L)
          (id, m.subject, m.from, m.text, m.parts.length, attSum)
        }
        .toDF("doc_id", "subject", "from_hdr", "body", "n_parts", "att_sum")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Résumé ✓ doc ' || doc_id AS subject,
                   'Jørgen <j@example.org>' AS from_hdr,
                   text AS body,
                   3 AS n_parts,
                   CAST(list_aggregate(list_transform(range(64),
                        k -> (doc_id * 7 + k * 13) % 256), 'sum') AS BIGINT) AS att_sum
            FROM documents ORDER BY doc_id"""),
    "MIME mail certificate: folded RFC 2047 subject (B+Q adjacent words), " +
      "nested multipart walk, quoted-printable and base64 transfer " +
      "decodes, attachment bytes — all byte-exact on the closed form")

  private val qMboxExtract = Q(
    "q_mbox_extract",
    (s, d) => {
      // mbox certificate: each doc becomes a 3-message mailbox whose
      // middle message's body contains lines starting 'From ' and
      // '>From ' — stored mboxrd-quoted ('>>From ' / '>From ') so the
      // splitter must NOT break on them and the unquoter must strip
      // exactly one '>'. flatMap explodes messages to rows.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          def msg(k: Int, body: String) =
            s"From sender$k@example.org Thu Jan 15 10:0$k:00 2026\n" +
              s"Subject: m$k doc $id\n" +
              "Content-Type: text/plain; charset=\"utf-8\"\n\n" +
              body.split("\n", -1).map { l =>
                if (l.matches(">*From .*")) ">" + l else l
              }.mkString("\n") + "\n\n"
          val bodies = Seq(
            text,
            s"From the start $id\n>From quoted $id\nplain line",
            s"tail message $id")
          val mbox = bodies.zipWithIndex
            .map { case (b, k) => msg(k, b) }.mkString.getBytes("UTF-8")
          graft.ext.Mail.parseMbox(mbox).zipWithIndex.map { case (m, k) =>
            (id, k, m.subject, m.text)
          }
        }
        .toDF("doc_id", "msg_idx", "subject", "body")
        .orderBy("doc_id", "msg_idx")
    },
    Some("""SELECT doc_id, msg_idx, 'm' || msg_idx || ' doc ' || doc_id AS subject,
                   CASE msg_idx
                     WHEN 0 THEN text
                     WHEN 1 THEN 'From the start ' || doc_id || chr(10) ||
                                 '>From quoted ' || doc_id || chr(10) || 'plain line'
                     ELSE 'tail message ' || doc_id END AS body
            FROM documents, (VALUES (0), (1), (2)) AS m(msg_idx)
            ORDER BY doc_id, msg_idx"""),
    "mbox certificate: 3-message mailboxes split on envelope lines with " +
      "mboxrd '>From' quoting round-tripped — message count, subjects " +
      "and bodies exact on the closed form")

  private val qEpubExtract = Q(
    "q_epub_extract",
    (s, d) => {
      // EPUB certificate: a 2-chapter book per doc built with the real
      // ZIP writer (stored mimetype first, deflated container/OPF/XHTML),
      // walked back through container.xml -> OPF manifest+spine ->
      // per-chapter HtmlText extraction. Chapter order comes from the
      // SPINE, which deliberately reverses the manifest order — an
      // extractor that reads manifest order breaks the hash.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val ch1 =
            s"<html><head><title>x</title></head><body><h1>Chapter One</h1>" +
              s"""<p>$esc</p></body></html>"""
          val ch2 =
            "<html><body><h1>Chapter Two</h1><p>&lt;end&gt; &amp; &#65;" +
              s"</p><p>fin $id</p></body></html>"
          // spine order c2-then-c1 vs manifest order c1-then-c2 is fixed
          // inside build (spine follows the chapters arg): pass ch2 first
          val epub = graft.ext.Epub.build(s"Book $id",
            Seq(("ch2.xhtml", ch2), ("ch1.xhtml", ch1)))
          val (title, chapters) = graft.ext.Epub.extract(epub)
            .getOrElse(throw new IllegalStateException(s"epub walk failed for $id"))
          (id, title, chapters.length,
            chapters.map(_.text).mkString("\u0001"))
        }
        .toDF("doc_id", "title", "n_chapters", "book_text")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'Book ' || doc_id AS title, 2 AS n_chapters,
                   'Chapter Two' || chr(10) || '<end> & A' ||
                     chr(10) || 'fin ' || doc_id ||
                     chr(1) ||
                   'x' || chr(10) || 'Chapter One' || chr(10) || text AS book_text
            FROM documents ORDER BY doc_id"""),
    "EPUB certificate: container.xml -> OPF -> spine-ordered XHTML " +
      "chapters through the real ZIP walk and the HtmlText state " +
      "machine — title, chapter count and concatenated text exact")

  private val qRtfExtract = Q(
    "q_rtf_extract",
    (s, d) => {
      // RTF certificate: the document text plus planted hazards — escaped
      // braces/backslash, \tab, \u Unicode with \'3f fallbacks, an
      // \emdash, and a {\*\generator} destination plus font/color tables
      // that MUST vanish — built deterministically and tokenized back.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val body = s"Doc $id\n" + text +
            "\n{a\\b}\té✓ end"
          val rtf = graft.ext.Rtf.build(body).getBytes("US-ASCII")
          val extracted = graft.ext.Rtf.text(rtf).getOrElse("")
          (id, extracted, extracted.length.toLong)
        }
        .toDF("doc_id", "extracted", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Doc ' || doc_id || chr(10) || text || chr(10) ||
                     '{a\b}' || chr(9) || chr(233) || chr(10003) || ' end' AS extracted,
                   CAST(length('Doc ' || doc_id || chr(10) || text || chr(10) ||
                     '{a\b}' || chr(9) || chr(233) || chr(10003) || ' end')
                     AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id"""),
    "RTF certificate: brace-grouped tokenizer over escapes, Unicode " +
      "\\uN+fallback, destination skipping (generator/fonttbl/colortbl) " +
      "— extracted text byte-exact on the closed form")

  private val qOdtExtract = Q(
    "q_odt_extract",
    (s, d) => {
      // ODT certificate: per doc a real ODF package (stored mimetype
      // magic, manifest, content.xml with a style prolog that MUST be
      // skipped) whose body plants every whitespace carrier the format
      // has — heading, <text:tab/>, <text:s text:c="3"/>, line-break —
      // plus entity refs and an <office:annotation> subtree whose nested
      // paragraph must NOT leak into the text layer.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val odt = graft.ext.Odf.buildOdt(Seq(
            s"""<text:h text:outline-level="1">Doc $id</text:h>""",
            s"<text:p>$esc</text:p>",
            """<text:p>a<text:tab/>b<text:s text:c="3"/>c<text:line-break/>""" +
              "d &amp; &#65;<office:annotation><text:p>IGNORED</text:p>" +
              "</office:annotation> end</text:p>"))
          val extracted = graft.ext.Odf.odtText(odt).getOrElse("")
          (id, extracted, extracted.length.toLong)
        }
        .toDF("doc_id", "extracted", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Doc ' || doc_id || chr(10) || text || chr(10) ||
                     'a' || chr(9) || 'b   c' || chr(10) || 'd & A end' || chr(10)
                     AS extracted,
                   CAST(length('Doc ' || doc_id || chr(10) || text || chr(10) ||
                     'a' || chr(9) || 'b   c' || chr(10) || 'd & A end' || chr(10))
                     AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id"""),
    "ODT certificate: ODF package walk (stored-mimetype magic, styles " +
      "prolog skipped) with tab/space-run/line-break whitespace " +
      "carriers, entity decodes and annotation-subtree exclusion — " +
      "text layer byte-exact on the closed form")

  private val qOdsExtract = Q(
    "q_ods_extract",
    (s, d) => {
      // ODS certificate: a 3-row sheet per doc — a header row, a row
      // with a number-columns-repeated run + an entity-bearing cell +
      // a repeated trailing-empty pad that must be trimmed, and an
      // all-empty row that must survive as a bare line.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val content =
            """<office:body><office:spreadsheet><table:table table:name="S">""" +
              s"<table:table-row><table:table-cell office:value-type=\"string\">" +
              s"<text:p>doc</text:p></table:table-cell>" +
              s"<table:table-cell office:value-type=\"string\"><text:p>$id</text:p>" +
              "</table:table-cell></table:table-row>" +
              "<table:table-row>" +
              s"<table:table-cell office:value-type=\"string\"><text:p>$esc</text:p>" +
              "</table:table-cell>" +
              """<table:table-cell table:number-columns-repeated="3" office:value-type="string"><text:p>x</text:p></table:table-cell>""" +
              "<table:table-cell office:value-type=\"string\"><text:p>&lt;v&gt;</text:p></table:table-cell>" +
              """<table:table-cell table:number-columns-repeated="2"/>""" +
              "</table:table-row>" +
              "<table:table-row><table:table-cell/></table:table-row>" +
              "</table:table></office:spreadsheet></office:body>"
          val ods = graft.ext.Odf.buildOdsRaw(content)
          val extracted = graft.ext.Odf.odsText(ods).getOrElse("")
          (id, extracted)
        }
        .toDF("doc_id", "sheet")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'doc' || chr(9) || doc_id || chr(10) ||
                   replace(text, chr(10), ' ') || chr(9) || 'x' || chr(9) || 'x' ||
                     chr(9) || 'x' || chr(9) || '<v>' || chr(10) ||
                   chr(10) AS sheet
            FROM documents ORDER BY doc_id"""),
    "ODS certificate: first-table cell grid with repeated-column " +
      "expansion, trailing-empty trim, entity decode and multi-line " +
      "cell flattening — tab-separated rows exact on the closed form")

  private val qSqliteExtract = Q(
    "q_sqlite_extract",
    (s, d) => {
      // SQLite certificate: per doc a 512-byte-page database whose one
      // table plants every read path — a 30-row tree that spans leaves
      // under an interior page, a 600-char overflow payload, INTEGER
      // PRIMARY KEY rowid aliasing, REAL-affinity float-back of
      // integral values (stored as INTEGER serials, exactly as real
      // SQLite writes them), negative ints, NULLs and a BLOB — decoded
      // back through the b-tree walk and reduced to closed forms.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val blob = Array.tabulate(16)(k => ((id * 3 + k) % 256).toByte)
          val rows: Seq[Seq[Any]] =
            Seq[Any](null, text, id.toDouble, 1L, blob) +:
            Seq[Any](null, "pad-" + ("y" * 600) + id, id + 0.5, 0L, null) +:
            Seq[Any](null, "end " + id, -2.0, -5L, null) +:
            (4 to 30).map(k => Seq[Any](null, "row " + k, k * 1.0, k.toLong, null))
          val db = graft.ext.Sqlite.build(512, Seq(
            ("t", Seq("id INTEGER PRIMARY KEY", "txt TEXT", "val REAL",
              "n INTEGER", "b BLOB"), rows)))
          val td = graft.ext.Sqlite.readTable(db, "t")
            .getOrElse(throw new IllegalStateException(s"sqlite walk failed for $id"))
          val r = td.rows
          (id, r.length.toLong, r.map(_._2.head.asInstanceOf[Long]).sum,
            r(0)._2(1).asInstanceOf[String],
            r(1)._2(1).asInstanceOf[String].length.toLong,
            r(0)._2(2).asInstanceOf[Double],
            r(1)._2(2).asInstanceOf[Double],
            r(0)._2(4).asInstanceOf[Array[Byte]]
              .foldLeft(0L)((a, x) => a + (x & 0xFF)),
            r(2)._2(3).asInstanceOf[Long])
        }
        .toDF("doc_id", "n_rows", "rowid_sum", "first_txt", "over_len",
          "v1", "v2", "blob_sum", "n3")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(30 AS BIGINT) AS n_rows,
                   CAST(465 AS BIGINT) AS rowid_sum,
                   text AS first_txt,
                   CAST(604 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS over_len,
                   CAST(doc_id AS DOUBLE) AS v1,
                   CAST(doc_id + 0.5 AS DOUBLE) AS v2,
                   CAST(list_aggregate(list_transform(range(16),
                        k -> (doc_id * 3 + k) % 256), 'sum') AS BIGINT) AS blob_sum,
                   CAST(-5 AS BIGINT) AS n3
            FROM documents ORDER BY doc_id"""),
    "SQLite certificate: b-tree walk over a multi-leaf 512B-page " +
      "database with overflow chains, rowid aliasing and REAL-affinity " +
      "integer float-back — every decoded value a closed form of doc_id")

  private val qMhtmlExtract = Q(
    "q_mhtml_extract",
    (s, d) => {
      // MHTML certificate: a Chrome-shaped page snapshot per doc — the
      // root HTML quoted-printable under multipart/related, two base64
      // resources keyed by Content-Location — walked back through the
      // MIME machinery and the HtmlText pass.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val esc = text.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          val html = s"<html><head><title>Page $id</title></head>" +
            s"<body><h1>Page $id</h1><p>$esc</p></body></html>"
          val blob = Array.tabulate(32)(k => ((id * 5 + k) % 256).toByte)
          val mht = graft.ext.Mhtml.build(s"Page $id",
            s"https://example.org/p/$id", html, Seq(
              (s"https://example.org/s/$id.css", "text/css",
                "body{margin:0}".getBytes("US-ASCII")),
              (s"https://example.org/b/$id.bin", "application/octet-stream",
                blob)))
          val doc = graft.ext.Mhtml.parse(mht)
            .getOrElse(throw new IllegalStateException(s"mhtml walk failed for $id"))
          (id, doc.title, doc.rootLocation, doc.text,
            doc.resources.length.toLong,
            doc.resources.map(_.location).mkString(","),
            doc.resources.map(_.size.toLong).sum)
        }
        .toDF("doc_id", "title", "root_loc", "page_text", "n_res",
          "res_locs", "res_bytes")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Page ' || doc_id AS title,
                   'https://example.org/p/' || doc_id AS root_loc,
                   'Page ' || doc_id || chr(10) || 'Page ' || doc_id ||
                     chr(10) || text AS page_text,
                   CAST(2 AS BIGINT) AS n_res,
                   'https://example.org/s/' || doc_id || '.css,' ||
                     'https://example.org/b/' || doc_id || '.bin' AS res_locs,
                   CAST(46 AS BIGINT) AS res_bytes
            FROM documents ORDER BY doc_id"""),
    "MHTML certificate: multipart/related walk with quoted-printable " +
      "root and base64 resources inventoried by Content-Location — " +
      "title, root URL, extracted page text and resource bytes exact")

  private val qDocExtract = Q(
    "q_doc_extract",
    (s, d) => {
      // Legacy Word certificate: a fast-saved-shaped .doc per document
      // — CFB container (FAT + mini-stream + directory), FIB, and a
      // four-piece piece table whose pieces are PHYSICALLY REVERSED in
      // the WordDocument stream and mix windows-1252 with UTF-16LE; a
      // reader that scans the stream instead of following the PlcPcd,
      // or decodes cp1252 bytes as Latin-1, breaks the hash.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val doc = graft.ext.MsDoc.build(Seq(
            (s"Doc $id\r", true),
            ("café — résumé…\r", false),
            (text + "\r", true),
            ("end\u0007" + id + "\r", false)))
          val extracted = graft.ext.MsDoc.text(doc).getOrElse("")
          (id, extracted, extracted.length.toLong,
            graft.ext.Multimodal.sniffFormat(doc))
        }
        .toDF("doc_id", "extracted", "n_chars", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Doc ' || doc_id || chr(10) || 'café — résumé…' || chr(10) ||
                     text || chr(10) || 'end' || chr(9) || doc_id || chr(10)
                     AS extracted,
                   CAST(length('Doc ' || doc_id || chr(10) || 'café — résumé…' ||
                     chr(10) || text || chr(10) || 'end' || chr(9) || doc_id ||
                     chr(10)) AS BIGINT) AS n_chars,
                   'doc' AS fmt
            FROM documents ORDER BY doc_id"""),
    "legacy Word (.doc) certificate: CFB walk + FIB + piece table with " +
      "physically-reversed cp1252/UTF-16 pieces, control-char " +
      "normalization — text layer byte-exact on the closed form")

  private val qXlsExtract = Q(
    "q_xls_extract",
    (s, d) => {
      // Legacy Excel certificate: a BIFF8 workbook per doc whose SST is
      // FORCED to split into a CONTINUE record mid-character-data (the
      // classic .xls parser trap — the string resumes under a fresh
      // option byte and may switch 8/16-bit width), plus RK int/double
      // encodings, NUMBER and BOOLERR cells — all read back through the
      // CFB + BIFF walk to closed forms.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val xls = graft.ext.Xls.build(Seq(
            graft.ext.Xls.Cell(0, 0, text),
            graft.ext.Xls.Cell(0, 1, "πΩ✓"),
            graft.ext.Xls.Cell(1, 0, id.toDouble),
            graft.ext.Xls.Cell(1, 1, id + 0.25),
            graft.ext.Xls.Cell(2, 0, true),
            graft.ext.Xls.Cell(2, 1, -3.0 * id)), sstSplitAt = 40)
          val cs = graft.ext.Xls.cells(xls)
            .getOrElse(throw new IllegalStateException(s"xls walk failed for $id"))
          val m = cs.map(c => (c.row, c.col) -> c.value).toMap
          (id, m((0, 0)).asInstanceOf[String], m((0, 1)).asInstanceOf[String],
            m((1, 0)).asInstanceOf[Double], m((1, 1)).asInstanceOf[Double],
            m((2, 0)).asInstanceOf[Boolean], m((2, 1)).asInstanceOf[Double],
            graft.ext.Multimodal.sniffFormat(xls))
        }
        .toDF("doc_id", "s1", "s2", "n1", "n2", "b1", "n3", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   text AS s1,
                   'πΩ✓' AS s2,
                   CAST(doc_id AS DOUBLE) AS n1,
                   CAST(doc_id + 0.25 AS DOUBLE) AS n2,
                   TRUE AS b1,
                   CAST(-3 * doc_id AS DOUBLE) AS n3,
                   'xls' AS fmt
            FROM documents ORDER BY doc_id"""),
    "legacy Excel (.xls) certificate: BIFF8 walk with an SST CONTINUE " +
      "split forced mid-string, RK int/double + NUMBER + BOOLERR cells " +
      "— every value a closed form of doc_id")

  private val qMsgExtract = Q(
    "q_msg_extract",
    (s, d) => {
      // Outlook .msg certificate: the MAPI property walk — top-level
      // subject/sender/body streams, a recipient sub-storage, an
      // attachment sub-storage with long-filename + binary-data
      // properties — laid out with the real CFB writer (storages
      // exercise the directory tree path) and read back to closed forms.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val att = Array.tabulate(24)(k => ((id * 11 + k) % 256).toByte)
          // even docs store the body ONLY as compressed RTF (the real
          // Outlook shape) — the LZFu + RTF-tokenizer fallback must
          // land on the same closed form as the plain-text property
          val msg = graft.ext.Msg.build(
            s"Msg $id ✓", s"Sender $id", text,
            Seq((s"Rcpt $id", s"r$id@example.org")),
            Seq((s"att$id.bin", att)),
            rtfBodyOnly = id % 2 == 0)
          val m = graft.ext.Msg.parse(msg)
            .getOrElse(throw new IllegalStateException(s"msg walk failed for $id"))
          (id, m.subject, m.senderName, m.body,
            m.recipients.map(r => r._1 + "<" + r._2 + ">").mkString(";"),
            m.attachments.map(_.filename).mkString(";"),
            m.attachments.map(_.bytes.foldLeft(0L)((a, x) => a + (x & 0xFF))).sum,
            graft.ext.Multimodal.sniffFormat(msg))
        }
        .toDF("doc_id", "subject", "sender", "body", "rcpts", "att_names",
          "att_sum", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Msg ' || doc_id || ' ✓' AS subject,
                   'Sender ' || doc_id AS sender,
                   text AS body,
                   'Rcpt ' || doc_id || '<r' || doc_id || '@example.org>' AS rcpts,
                   'att' || doc_id || '.bin' AS att_names,
                   CAST(list_aggregate(list_transform(range(24),
                        k -> (doc_id * 11 + k) % 256), 'sum') AS BIGINT) AS att_sum,
                   'msg' AS fmt
            FROM documents ORDER BY doc_id"""),
    "Outlook .msg certificate: MAPI property streams through the CFB " +
      "storage tree — subject/sender/body, recipient and attachment " +
      "sub-storages, attachment bytes — closed forms of doc_id")

  private val qPptExtract = Q(
    "q_ppt_extract",
    (s, d) => {
      // Legacy PowerPoint certificate: a three-slide record tree mixing
      // TextBytesAtom (Latin-1) and TextCharsAtom (UTF-16) with \r and
      // 0x0B marks normalized — the deck text layer on a closed form.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val ppt = graft.ext.Ppt.build(Seq(
            s"Deck $id\rsubtitle",
            text,
            s"fin ✓ $id"))
          val extracted = graft.ext.Ppt.text(ppt).getOrElse("")
          (id, extracted, graft.ext.Multimodal.sniffFormat(ppt))
        }
        .toDF("doc_id", "deck_text", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Deck ' || doc_id || chr(10) || 'subtitle' || chr(10) ||
                     text || chr(10) || 'fin ✓ ' || doc_id AS deck_text,
                   'ppt' AS fmt
            FROM documents ORDER BY doc_id"""),
    "legacy PowerPoint (.ppt) certificate: record-tree walk collecting " +
      "TextBytesAtom/TextCharsAtom in stream order with paragraph-mark " +
      "normalization — deck text exact on the closed form")

  private val qIsoExtract = Q(
    "q_iso_extract",
    (s, d) => {
      // ISO 9660 certificate: a hybrid PVD+Joliet image per doc with a
      // nested directory, spaced/unicode filenames (Joliet UCS-2BE),
      // and file extents read back byte-exact. The walk must prefer
      // the Joliet tree — primary names are 8.3-mangled.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val blob = Array.tabulate(40)(k => ((id * 13 + k) % 256).toByte)
          val iso = graft.ext.Iso.build(Seq(
            ("doc text.txt", text.getBytes("UTF-8")),
            (s"data/blob $id.bin", blob),
            ("data/nöte.txt", ("note " + id).getBytes("UTF-8"))))
          val es = graft.ext.Iso.entries(iso)
            .getOrElse(throw new IllegalStateException(s"iso walk failed for $id"))
          val back = new String(
            graft.ext.Iso.read(iso, "doc text.txt").get, "UTF-8")
          val blobSum = graft.ext.Iso.read(iso, s"data/blob $id.bin").get
            .foldLeft(0L)((a, x) => a + (x & 0xFF))
          (id, es.map(_.path).sorted.mkString(";"), es.count(_.isDir).toLong,
            back, blobSum,
            new String(graft.ext.Iso.read(iso, "data/nöte.txt").get, "UTF-8"),
            graft.ext.Multimodal.sniffFormat(iso))
        }
        .toDF("doc_id", "paths", "n_dirs", "text_back", "blob_sum", "note",
          "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'data;data/blob ' || doc_id || '.bin;data/nöte.txt;doc text.txt'
                     AS paths,
                   CAST(1 AS BIGINT) AS n_dirs,
                   text AS text_back,
                   CAST(list_aggregate(list_transform(range(40),
                        k -> (doc_id * 13 + k) % 256), 'sum') AS BIGINT) AS blob_sum,
                   'note ' || doc_id AS note,
                   'iso' AS fmt
            FROM documents ORDER BY doc_id"""),
    "ISO 9660 certificate: PVD+Joliet hybrid image walk with nested " +
      "directories, UCS-2 names and byte-exact file extents — closed " +
      "forms of doc_id")

  def all: Seq[Q] = Seq(
    qAvroRoundtrip, qArrowRoundtrip, qEmlExtract, qMboxExtract, qEpubExtract, qRtfExtract,
    qOdtExtract, qOdsExtract, qSqliteExtract, qMhtmlExtract, qDocExtract,
    qXlsExtract, qMsgExtract, qPptExtract, qIsoExtract)
}
