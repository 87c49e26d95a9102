package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal dependency-free .xlsx writer (SpreadsheetML): an xlsx is a
  * zip of XML parts — [Content_Types], the root rels, the workbook with
  * its sheet list, and one worksheet XML per tab. Strings are written as
  * inline strings (`t="inlineStr"`), numbers as native numeric cells, so
  * no sharedStrings part is needed. Covers exactly what the report sink
  * requires (typed cells, many sheets); no styling/formulas — the engine
  * computes formula VALUES (see [[DiagReport.astraMetrics]]), which is
  * the whole point of moving the reference's Excel formulas server-side.
  */
object DiagXlsx {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' => "" // control chars are invalid in XML 1.0
      case c => c.toString
    }

  /** 0-based column index → A1-style letters. */
  private[graft] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null | "" => ""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double if !n.isNaN && !n.isInfinite => s"""<c r="$ref"><v>$n</v></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  private def sheetXml(rows: Seq[Seq[Any]]): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) => cellXml(s"${colRef(c)}${r + 1}", v) }
      s"""<row r="${r + 1}">${cs.mkString}</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
  }

  /** Write `sheets` (name → rows of cells) as a valid .xlsx at `path`. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    val n = sheets.length
    part("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
             s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
           }.mkString}</sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
    }
    zip.close()
  }
}
