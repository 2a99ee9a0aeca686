package graft.ops

import org.apache.spark.sql.functions._

import Tables._

/** Sidecar/metadata formats a crawl collects alongside content: RSS and
  * Atom feeds, BitTorrent metainfo, iCalendar events and vCards — each
  * a self-built-fixture certificate in the DocFormatQueries mold.
  */
object SidecarQueries {

  private val qFeedExtract = Q(
    "q_feed_extract",
    (s, d) => {
      // RSS certificate: a 2-item channel per doc — item 0 carries the
      // document text in a CDATA section (with the ]]> escape split
      // when the text contains one), item 1 entity-encoded markup; the
      // parse explodes to item rows.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val cdata = text.replace("]]>", "]]]]><![CDATA[>")
          val rss =
            s"""<?xml version="1.0"?><rss version="2.0"><channel>
               |<title>Feed $id</title><link>https://e.example/$id</link>
               |<item><title>Post &amp; $id</title>
               |<link>https://e.example/$id/0</link><pubDate>d0</pubDate>
               |<description><![CDATA[$cdata]]></description></item>
               |<item><title>Second</title>
               |<link>https://e.example/$id/1</link><pubDate>d1</pubDate>
               |<description>plain &lt;x&gt;</description></item>
               |</channel></rss>""".stripMargin
          val f = graft.ext.Feed.parse(rss.getBytes("UTF-8"))
            .getOrElse(throw new IllegalStateException(s"feed parse failed for $id"))
          f.items.zipWithIndex.map { case (it, k) =>
            (id, k, f.title, it.title, it.link, it.body)
          }
        }
        .toDF("doc_id", "item_idx", "feed_title", "title", "link", "body")
        .orderBy("doc_id", "item_idx")
    },
    Some("""SELECT doc_id, item_idx,
                   'Feed ' || doc_id AS feed_title,
                   CASE item_idx WHEN 0 THEN 'Post & ' || doc_id
                        ELSE 'Second' END AS title,
                   'https://e.example/' || doc_id || '/' || item_idx AS link,
                   CASE item_idx WHEN 0 THEN text ELSE 'plain <x>' END AS body
            FROM documents, (VALUES (0), (1)) AS i(item_idx)
            ORDER BY doc_id, item_idx"""),
    "RSS feed certificate: channel/item scrape with CDATA-verbatim " +
      "descriptions (]]> split escape) and entity decodes — item rows " +
      "exact on the closed form")

  private val qTorrentExtract = Q(
    "q_torrent_extract",
    (s, d) => {
      // BitTorrent metainfo certificate: multi-file info dict per doc;
      // the infohash is SHA-1 over the EXACT bencoded info span (length
      // asserted — hex digest itself has no DuckDB twin).
      import s.implicits._
      documents(s, d).select(col("doc_id"))
        .as[Long]
        .map { id =>
          val meta = graft.ext.Bencode.encode(Map(
            "announce" -> s"http://tr.example/$id",
            "info" -> Map(
              "name" -> s"doc-$id",
              "piece length" -> 16384L,
              "files" -> Seq(
                Map("length" -> id, "path" -> Seq("a", "part1.bin")),
                Map("length" -> (2 * id + 1), "path" -> Seq("part2.bin"))))))
          val t = graft.ext.Bencode.torrent(meta)
            .getOrElse(throw new IllegalStateException(s"torrent parse failed for $id"))
          (id, t.announce, t.name, t.pieceLength, t.totalLength,
            t.files.map { case (p, l) => s"$p=$l" }.mkString(";"),
            t.infoHashHex.length.toLong,
            graft.ext.Multimodal.sniffFormat(meta))
        }
        .toDF("doc_id", "announce", "name", "piece_len", "total_len",
          "files", "hash_len", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'http://tr.example/' || doc_id AS announce,
                   'doc-' || doc_id AS name,
                   CAST(16384 AS BIGINT) AS piece_len,
                   CAST(3 * doc_id + 1 AS BIGINT) AS total_len,
                   'a/part1.bin=' || doc_id || ';part2.bin=' || (2 * doc_id + 1)
                     AS files,
                   CAST(40 AS BIGINT) AS hash_len,
                   'torrent' AS fmt
            FROM documents ORDER BY doc_id"""),
    "BitTorrent metainfo certificate: bencode walk with byte-span " +
      "tracking, multi-file paths, SHA-1 infohash over the exact info " +
      "dict bytes — closed forms of doc_id")

  private val qIcsExtract = Q(
    "q_ics_extract",
    (s, d) => {
      // iCalendar certificate: two VEVENTs per doc — the first carries
      // the document text RFC 5545 TEXT-escaped AND folded at 60
      // octets, plus a VALARM that must be skipped; round-trips to the
      // original text.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val esc = text.replace("\\", "\\\\").replace("\n", "\\n")
            .replace(",", "\\,").replace(";", "\\;")
          val folded = esc.grouped(60).mkString("\r\n ")
          val ics = ("BEGIN:VCALENDAR\r\nVERSION:2.0\r\n" +
            "BEGIN:VEVENT\r\n" +
            s"SUMMARY:$folded\r\n" +
            s"LOCATION:Room $id\r\n" +
            s"DTSTART;TZID=UTC:20260115T100000\r\n" +
            "BEGIN:VALARM\r\nSUMMARY:ALARM NOISE\r\nEND:VALARM\r\n" +
            "END:VEVENT\r\n" +
            "BEGIN:VEVENT\r\n" +
            s"SUMMARY:Standup $id\r\nDTSTART:20260116T090000\r\n" +
            "END:VEVENT\r\nEND:VCALENDAR\r\n").getBytes("UTF-8")
          val es = graft.ext.VObject.events(ics)
            .getOrElse(throw new IllegalStateException(s"ics parse failed for $id"))
          es.zipWithIndex.map { case (e, k) =>
            (id, k, e.summary, e.location, e.dtStart)
          }
        }
        .toDF("doc_id", "ev_idx", "summary", "location", "dtstart")
        .orderBy("doc_id", "ev_idx")
    },
    Some("""SELECT doc_id, ev_idx,
                   CASE ev_idx WHEN 0 THEN text
                        ELSE 'Standup ' || doc_id END AS summary,
                   CASE ev_idx WHEN 0 THEN 'Room ' || doc_id
                        ELSE '' END AS location,
                   CASE ev_idx WHEN 0 THEN '20260115T100000'
                        ELSE '20260116T090000' END AS dtstart
            FROM documents, (VALUES (0), (1)) AS e(ev_idx)
            ORDER BY doc_id, ev_idx"""),
    "iCalendar certificate: unfolding at 60-octet folds, RFC 5545 TEXT " +
      "unescape round-trip of the document text, VALARM sub-component " +
      "skip — event rows exact on the closed form")

  private val qVcfExtract = Q(
    "q_vcf_extract",
    (s, d) => {
      // vCard certificate: a 2-card file per doc with typed EMAIL
      // params and multiple TELs.
      import s.implicits._
      documents(s, d).select(col("doc_id"))
        .as[Long]
        .map { id =>
          val vcf = ("BEGIN:VCARD\r\nVERSION:3.0\r\n" +
            s"FN:Person $id\r\n" +
            s"EMAIL;TYPE=work:p$id@example.org\r\n" +
            s"TEL:+1-555-$id\r\nTEL:+2-555-$id\r\n" +
            "END:VCARD\r\n" +
            s"BEGIN:VCARD\r\nFN:Alt $id\r\nEMAIL:alt$id@example.org\r\n" +
            "END:VCARD\r\n").getBytes("UTF-8")
          val cs = graft.ext.VObject.cards(vcf)
            .getOrElse(throw new IllegalStateException(s"vcf parse failed for $id"))
          (id, cs.map(_.fn).mkString(";"),
            cs.flatMap(_.emails).mkString(";"),
            cs.head.tels.mkString(";"),
            graft.ext.Multimodal.sniffFormat(vcf))
        }
        .toDF("doc_id", "names", "emails", "tels", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Person ' || doc_id || ';Alt ' || doc_id AS names,
                   'p' || doc_id || '@example.org;alt' || doc_id ||
                     '@example.org' AS emails,
                   '+1-555-' || doc_id || ';+2-555-' || doc_id AS tels,
                   'vcf' AS fmt
            FROM documents ORDER BY doc_id"""),
    "vCard certificate: multi-card split, FN/EMAIL/TEL collection with " +
      "params — closed forms of doc_id")

  private val qTnefExtract = Q(
    "q_tnef_extract",
    (s, d) => {
      // TNEF certificate: per doc a winmail.dat whose body alternates
      // between plain attBody and PR_RTF_COMPRESSED-inside-attMsgProps
      // (LZFu + RTF tokenizer — the real Outlook shape), plus an
      // attachment triple; attribute checksums verified on every read.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val att = Array.tabulate(20)(k => ((id * 17 + k) % 256).toByte)
          val t = graft.ext.Tnef.build(s"Subj $id", text,
            rtfBody = id % 2 == 0, Seq((s"f$id.bin", att)))
          val p = graft.ext.Tnef.parse(t)
            .getOrElse(throw new IllegalStateException(s"tnef parse failed for $id"))
          (id, p.subject, p.body,
            p.attachments.map(_.title).mkString(";"),
            p.attachments.map(_.data.foldLeft(0L)((a, x) => a + (x & 0xFF))).sum,
            graft.ext.Multimodal.sniffFormat(t))
        }
        .toDF("doc_id", "subject", "body", "att_names", "att_sum", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Subj ' || doc_id AS subject,
                   text AS body,
                   'f' || doc_id || '.bin' AS att_names,
                   CAST(list_aggregate(list_transform(range(20),
                        k -> (doc_id * 17 + k) % 256), 'sum') AS BIGINT) AS att_sum,
                   'tnef' AS fmt
            FROM documents ORDER BY doc_id"""),
    "TNEF (winmail.dat) certificate: checksummed attribute walk with " +
      "body alternating plain attBody vs LZFu-compressed RTF inside " +
      "the MAPI property block, attachment triples — closed forms")

  private val qTexExtract = Q(
    "q_tex_extract",
    (s, d) => {
      // LaTeX certificate: an arXiv-shaped source per doc — preamble
      // commands dropped, comment lines dropped, sectioning unwrapped,
      // inline + display math dropped, itemize rendered, cite/ref
      // dropped with arguments, emphasis unwrapped — the detex envelope
      // against a DuckDB closed form.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val src = "\\documentclass{article}\n" +
            "\\" + "usepackage{amsmath}\n" +
            "% generated fixture, not kept\n" +
            "\\begin{document}\n" +
            s"\\section{Doc $id \\textbf{bold}}\n" +
            text + "\n" +
            s"Inline $$x_$id$$ math and \\cite{ref$id} vanish.\n" +
            "\\begin{equation}\nE=mc^2\n\\end{equation}\n" +
            s"\\begin{itemize}\n\\item alpha $id\n\\item beta~b\n\\end{itemize}\n" +
            s"\\emph{end $id}\\\\\ntail\n" +
            "\\end{document}\n"
          val extracted = graft.ext.Tex.text(src)
          (id, extracted, extracted.length.toLong)
        }
        .toDF("doc_id", "extracted", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'Doc ' || doc_id || ' bold' || chr(10) || chr(10) ||
                     text || chr(10) ||
                     'Inline math and vanish.' || chr(10) || chr(10) ||
                     '- alpha ' || doc_id || chr(10) || '- beta b' ||
                     chr(10) || chr(10) ||
                     'end ' || doc_id || chr(10) || chr(10) || 'tail'
                     AS extracted,
                   CAST(length('Doc ' || doc_id || ' bold' || chr(10) ||
                     chr(10) || text || chr(10) ||
                     'Inline math and vanish.' || chr(10) || chr(10) ||
                     '- alpha ' || doc_id || chr(10) || '- beta b' ||
                     chr(10) || chr(10) ||
                     'end ' || doc_id || chr(10) || chr(10) || 'tail')
                     AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id"""),
    "LaTeX (arXiv) certificate: deterministic detex envelope — " +
      "sectioning/emphasis unwraps, math + cite/ref + preamble drops, " +
      "itemize rendering — byte-exact on the closed form")

  private val qBibExtract = Q(
    "q_bib_extract",
    (s, d) => {
      // BibTeX certificate: @string resolution, # concatenation,
      // brace/quote/bare values, @comment skip, wrapped-field
      // whitespace collapse — one entry per doc with the abstract
      // carrying the document text.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bib = "@string{conf = {Proc. of GRAFT}}\n" +
            "free text between entries is ignored\n" +
            s"@article{doc$id,\n" +
            s"  title = {Title {$id}},\n" +
            "  author = \"A. Author and B. Author\",\n" +
            s"  year = ${1990 + id % 30},\n" +
            s"  booktitle = conf # { vol $id},\n" +
            s"  abstract = {$text}\n" +
            "}\n@comment{skipped}\n"
          val es = graft.ext.Bib.entries(bib)
          val e = es.headOption
            .getOrElse(throw new IllegalStateException(s"bib parse failed for $id"))
          (id, es.length.toLong, e.entryType, e.key,
            e.fields("title"), e.fields("author"), e.fields("year"),
            e.fields("booktitle"), e.fields("abstract"))
        }
        .toDF("doc_id", "n_entries", "etype", "key", "title", "author",
          "year", "booktitle", "abstract")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(1 AS BIGINT) AS n_entries,
                   'article' AS etype,
                   'doc' || doc_id AS key,
                   'Title ' || doc_id AS title,
                   'A. Author and B. Author' AS author,
                   CAST(1990 + doc_id % 30 AS VARCHAR) AS year,
                   'Proc. of GRAFT vol ' || doc_id AS booktitle,
                   replace(text, chr(10), ' ') AS abstract
            FROM documents ORDER BY doc_id"""),
    "BibTeX certificate: entry walk with @string resolution, # " +
      "concatenation, nested-brace stripping, wrapped-field whitespace " +
      "collapse — fields exact on closed forms of doc_id")

  private val qIpynbExtract = Q(
    "q_ipynb_extract",
    (s, d) => {
      // Jupyter certificate: nbformat-4 notebooks with line-list
      // sources, stream + execute_result outputs and a rich mimetype
      // that must be counted, not decoded; cells explode to rows.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val nb = graft.ext.Ipynb.build(Seq(
            ("markdown", s"# Doc $id\n" + text, None),
            ("code", s"x = $id\nprint(x)\n", Some(s"$id\n")),
            ("code", "y", None)))
          val cs = graft.ext.Ipynb.cells(nb)
            .getOrElse(throw new IllegalStateException(s"ipynb parse failed for $id"))
          cs.map(c => (id, c.idx, c.cellType, c.source, c.output,
            c.richOutputs.toLong))
        }
        .toDF("doc_id", "cell_idx", "cell_type", "source", "output", "rich")
        .orderBy("doc_id", "cell_idx")
    },
    Some("""SELECT doc_id, cell_idx,
                   CASE cell_idx WHEN 0 THEN 'markdown' ELSE 'code' END
                     AS cell_type,
                   CASE cell_idx
                     WHEN 0 THEN '# Doc ' || doc_id || chr(10) || text
                     WHEN 1 THEN 'x = ' || doc_id || chr(10) || 'print(x)' || chr(10)
                     ELSE 'y' END AS source,
                   CASE cell_idx
                     WHEN 1 THEN doc_id || chr(10) || chr(10) || 'res'
                     ELSE '' END AS output,
                   CAST(CASE cell_idx WHEN 1 THEN 1 ELSE 0 END AS BIGINT) AS rich
            FROM documents, (VALUES (0), (1), (2)) AS c(cell_idx)
            ORDER BY doc_id, cell_idx"""),
    "Jupyter notebook certificate: nbformat-4 cell walk with line-list " +
      "source joins, stream/execute_result output extraction and rich-" +
      "mimetype counting — cell rows exact on closed forms")

  private val qDbfExtract = Q(
    "q_dbf_extract",
    (s, d) => {
      // dBase certificate: a 3-record table per doc (middle record
      // DELETED — must vanish) across the C/N/D/L type set with
      // padding trims and blank-as-null.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val tag = text.substring(0, math.min(40, text.length))
          val fields = Seq(
            graft.ext.Dbf.DbfField("NUM", 'N', 12, 0),
            graft.ext.Dbf.DbfField("VAL", 'N', 10, 3),
            graft.ext.Dbf.DbfField("TAG", 'C', 40, 0),
            graft.ext.Dbf.DbfField("FLAG", 'L', 1, 0),
            graft.ext.Dbf.DbfField("WHEN", 'D', 8, 0))
          val dbf = graft.ext.Dbf.build(fields, Seq(
            (false, Seq(id, id + 0.25, tag, true, "20260815")),
            (true, Seq(0L, 0.0, "DELETED ROW", false, "19700101")),
            (false, Seq(-3 * id, 0.5, "tail " + id, false, null))))
          val t = graft.ext.Dbf.read(dbf)
            .getOrElse(throw new IllegalStateException(s"dbf read failed for $id"))
          val r0 = t.rows(0); val r2 = t.rows(1)
          (id, t.rows.length.toLong,
            r0(0).asInstanceOf[Long], r0(1).asInstanceOf[Double],
            r0(2).asInstanceOf[String],
            r0(3).asInstanceOf[Boolean], r0(4).asInstanceOf[String],
            r2(0).asInstanceOf[Long], r2(2).asInstanceOf[String],
            r2(4) == null,
            graft.ext.Multimodal.sniffFormat(dbf))
        }
        .toDF("doc_id", "n_rows", "num0", "val0", "tag0", "flag0",
          "when0", "num2", "tag2", "when2_null", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(2 AS BIGINT) AS n_rows,
                   doc_id AS num0,
                   CAST(doc_id + 0.25 AS DOUBLE) AS val0,
                   rtrim(substring(text, 1, 40), ' ' || chr(10)) AS tag0,
                   TRUE AS flag0,
                   '20260815' AS when0,
                   -3 * doc_id AS num2,
                   'tail ' || doc_id AS tag2,
                   TRUE AS when2_null,
                   'dbf' AS fmt
            FROM documents ORDER BY doc_id"""),
    "dBase .dbf certificate: fixed-width record walk over C/N/D/L " +
      "types with deleted-record skip, padding trims and blank-null " +
      "decode — closed forms of doc_id")

  private val qAxmlExtract = Q(
    "q_axml_extract",
    (s, d) => {
      // AXML certificate: an AndroidManifest per doc — string pool
      // alternating UTF-16/UTF-8 by parity (both length-extension
      // codecs), typed attributes (string/int/bool/float), permission
      // collection, the application label carrying the document text.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val axml = graft.ext.Axml.build(Seq(
            (0, "manifest", Seq(
              ("package", s"org.example.app$id"),
              ("versionCode", (id % 1000).toInt),
              ("versionName", s"1.$id"))),
            (1, "uses-permission", Seq(("name", "android.permission.INTERNET"))),
            (1, "uses-permission", Seq(("name", s"org.example.PERM_$id"))),
            (1, "application", Seq(
              ("label", text), ("debuggable", id % 3 == 0)))),
            utf8Pool = id % 2 == 0)
          val es = graft.ext.Axml.elements(axml)
            .getOrElse(throw new IllegalStateException(s"axml walk failed for $id"))
          val (pkg, ver, perms) = graft.ext.Axml.manifest(axml).get
          val app = es.find(_.name == "application").get.attrs.toMap
          val mattrs: Map[String, String] = es.head.attrs.toMap
          (id, pkg, ver,
            mattrs("versionCode"),
            perms.mkString(";"), app("label"), app("debuggable"),
            graft.ext.Multimodal.sniffFormat(axml))
        }
        .toDF("doc_id", "pkg", "ver", "vcode", "perms", "label", "dbg", "fmt")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'org.example.app' || doc_id AS pkg,
                   '1.' || doc_id AS ver,
                   CAST(doc_id % 1000 AS VARCHAR) AS vcode,
                   'android.permission.INTERNET;org.example.PERM_' || doc_id
                     AS perms,
                   text AS label,
                   CASE WHEN doc_id % 3 = 0 THEN 'true' ELSE 'false' END AS dbg,
                   'axml' AS fmt
            FROM documents ORDER BY doc_id"""),
    "Android binary XML certificate: chunk walk with UTF-16/UTF-8 pool " +
      "alternation, typed attribute decode and manifest envelope — " +
      "closed forms of doc_id")

  private val qPoExtract = Q(
    "q_po_extract",
    (s, d) => {
      // gettext certificate: a catalog per doc whose long msgid (the
      // document text) wraps across continuation strings, plus a
      // context entry, a plural pair, a fuzzy entry and the header —
      // the MT-pairs view must keep exactly the clean pairs.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val po = graft.ext.Gettext.build(Seq(
            ("", text, Seq(s"übersetzt $id"), false),
            ("ctx", s"key $id", Seq(s"wert $id"), false),
            ("", s"plural $id", Seq("eins", "%d viele"), false),
            ("", s"fuzzy $id", Seq("unsicher"), true)))
          val es = graft.ext.Gettext.entries(po)
          val ps = graft.ext.Gettext.pairs(po)
          (id, es.length.toLong, ps.length.toLong,
            ps(0)._1, ps(0)._2, es(1).ctxt,
            es(2).strs.mkString(";"),
            es.count(_.fuzzy).toLong)
        }
        .toDF("doc_id", "n_entries", "n_pairs", "src0", "tgt0", "ctxt1",
          "plural2", "n_fuzzy")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(4 AS BIGINT) AS n_entries,
                   CAST(3 AS BIGINT) AS n_pairs,
                   text AS src0,
                   'übersetzt ' || doc_id AS tgt0,
                   'ctx' AS ctxt1,
                   'eins;%d viele' AS plural2,
                   CAST(1 AS BIGINT) AS n_fuzzy
            FROM documents ORDER BY doc_id"""),
    "gettext .po certificate: continuation-string concatenation, C " +
      "escapes, msgctxt/plural forms, fuzzy gating, header exclusion — " +
      "aligned pairs exact on closed forms")

  private val qXliffExtract = Q(
    "q_xliff_extract",
    (s, d) => {
      // XLIFF certificate: 1.2 trans-units with entity-bearing text,
      // state attributes and language metadata.
      import s.implicits._
      documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val x = graft.ext.Xliff.build("en", "de", Seq(
            (s"u$id-1", text, s"Ziel & $id", "translated"),
            (s"u$id-2", s"src <$id>", "", "new")))
          val doc = graft.ext.Xliff.parse(x)
            .getOrElse(throw new IllegalStateException(s"xliff parse failed for $id"))
          (id, doc.srcLang, doc.trgLang, doc.units.length.toLong,
            doc.units(0).source, doc.units(0).target, doc.units(0).state,
            doc.units(1).source, doc.units(1).state)
        }
        .toDF("doc_id", "src_lang", "trg_lang", "n_units", "source0",
          "target0", "state0", "source1", "state1")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   'en' AS src_lang, 'de' AS trg_lang,
                   CAST(2 AS BIGINT) AS n_units,
                   text AS source0,
                   'Ziel & ' || doc_id AS target0,
                   'translated' AS state0,
                   'src <' || doc_id || '>' AS source1,
                   'new' AS state1
            FROM documents ORDER BY doc_id"""),
    "XLIFF certificate: trans-unit walk with entity decode, state " +
      "attributes and language metadata — closed forms of doc_id")

  def all: Seq[Q] = Seq(
    qFeedExtract, qTorrentExtract, qIcsExtract, qVcfExtract, qTnefExtract,
    qTexExtract, qBibExtract, qIpynbExtract, qDbfExtract, qAxmlExtract,
    qPoExtract, qXliffExtract)
}
