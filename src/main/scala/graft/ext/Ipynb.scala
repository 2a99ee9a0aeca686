package graft.ext

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Jupyter notebook (.ipynb) extraction — the code-corpus row of every
  * GitHub crawl. A notebook is nbformat-4 JSON; the envelope:
  *
  *   - `cells[]` in order, each (cell_type, source) where source is a
  *     string OR a list of line strings (joined verbatim — lines carry
  *     their own trailing newlines);
  *   - code-cell outputs: `stream` text, `execute_result` /
  *     `display_data` `data["text/plain"]` — same string-or-list shape;
  *     rich mimetypes (images) are counted, not decoded;
  *   - nbformat-3 worksheets fall back (`input` instead of `source`).
  *
  * Scale shape: one notebook = one payload row, map-only on executors.
  */
object Ipynb {

  final case class Cell(idx: Int, cellType: String, source: String,
      output: String, richOutputs: Int)

  /** None when the payload is not parseable notebook JSON. */
  def cells(b: Array[Byte]): Option[Vector[Cell]] =
    try {
      val root = JsonMethods.parse(
        new String(b, java.nio.charset.StandardCharsets.UTF_8))
      val cellsJson: Seq[JValue] = root \ "cells" match {
        case JArray(cs) => cs
        case _ => root \ "worksheets" match { // nbformat 3
          case JArray(ws) => ws.flatMap(w => w \ "cells" match {
            case JArray(cs) => cs
            case _ => Nil
          })
          case _ => return None
        }
      }
      Some(cellsJson.zipWithIndex.map { case (c, k) =>
        val typ = str(c \ "cell_type")
        val source = textOf(c \ "source") match {
          case "" => textOf(c \ "input") // nbformat 3 code cells
          case s  => s
        }
        var rich = 0
        val outs = c \ "outputs" match {
          case JArray(os) => os.map { o =>
            str(o \ "output_type") match {
              case "stream" => textOf(o \ "text")
              case "execute_result" | "display_data" =>
                val data = o \ "data"
                val plain = textOf(data \ "text/plain")
                data match {
                  case JObject(fs) =>
                    rich += fs.count { case (k2, _) =>
                      k2 != "text/plain" }
                  case _ =>
                }
                plain
              case "pyout" => textOf(o \ "text") // nbformat 3
              case "error" => ""
              case _ => ""
            }
          }.filter(_.nonEmpty).mkString("\n")
          case _ => ""
        }
        Cell(k, typ, source, outs, rich)
      }.toVector)
    } catch { case _: Exception => None }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case _ => ""
  }

  /** nbformat string-or-list-of-lines. */
  private def textOf(v: JValue): String = v match {
    case JString(s) => s
    case JArray(parts) => parts.collect { case JString(s) => s }.mkString
    case _ => ""
  }

  /** Deterministic nbformat-4 builder for certificates/specs. */
  private[graft] def build(cells: Seq[(String, String, Option[String])]): Array[Byte] = {
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    val cellJson = cells.map { case (typ, source, out) =>
      // source as a line list (the common on-disk shape)
      val lines = source.split("(?<=\n)").toSeq.filter(_.nonEmpty)
      val src = lines.map(jstr).mkString("[", ",", "]")
      val outputs = out match {
        case Some(o) =>
          s""","outputs":[{"output_type":"stream","name":"stdout","text":${jstr(o)}},
             |{"output_type":"execute_result","data":{"text/plain":${jstr("res")},
             |"image/png":${jstr("AAAA")}},"metadata":{},"execution_count":1}],
             |"execution_count":1""".stripMargin.replace("\n", "")
        case None if typ == "code" => ""","outputs":[],"execution_count":null"""
        case None => ""
      }
      s"""{"cell_type":${jstr(typ)},"metadata":{},"source":$src$outputs}"""
    }.mkString("[", ",", "]")
    (s"""{"nbformat":4,"nbformat_minor":5,"metadata":{},"cells":$cellJson}""")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
