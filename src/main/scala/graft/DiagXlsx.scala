package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal dependency-free .xlsx writer (SpreadsheetML): an xlsx is a
  * zip of XML parts — [Content_Types], the root rels, the workbook with
  * its sheet list, a styles part, and one worksheet XML per tab. Strings
  * are written as inline strings (`t="inlineStr"`), numbers as native
  * numeric cells, so no sharedStrings part is needed. Covers what the
  * report sink requires: typed cells, many sheets, the reference's
  * number formats (counts/bytes, 2-dp ms/MB, percents, 4-dp TPS —
  * explore.py:1221-1296) via [[DiagXlsx.Styled]], frozen header panes
  * (explore.py sheets_data freeze_row/freeze_col), merged title ranges
  * (merge_range, explore.py:1343, 1395-1396, 1693-1695, 1807-1843) and
  * cell comments (write_comment via write_cmt, explore.py:210-213 —
  * emitted as the classic comments part + VML note shapes, the same
  * mechanism xlsxwriter uses). No formulas — the engine computes
  * formula VALUES (see [[DiagReport.astraMetrics]]), which is the whole
  * point of moving the reference's Excel formulas server-side.
  */
object DiagXlsx {

  /** A cell value with one of the [[Styles]] format indices. */
  final case class Styled(v: Any, style: Int)

  /** cellXfs indices (position in the styles part below). */
  object Styles {
    val Default = 0
    val Int0 = 1    // #,##0       — counts, bytes, uptime
    val Dec2 = 2    // #,##0.00    — ms latencies, MB partition sizes
    val Pct2 = 3    // 0.00%       — ratio-of-total columns
    val Dec4 = 4    // #,##0.0000  — TPS/TPMo
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      // XML 1.0 allows #x9/#xA/#xD only; dropping \n/\r would silently
      // flatten multi-line warning messages (the inline strings carry
      // xml:space="preserve" precisely so they survive)
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }

  /** 0-based column index → A1-style letters. */
  private[graft] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** A1-style ref → 0-based (row, col) — anchors the VML note shapes. */
  private[graft] def parseRef(ref: String): (Int, Int) = {
    val (letters, digits) = ref.span(_.isLetter)
    val col = letters.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  private def cellXml(ref: String, v: Any, style: Int = 0): String = {
    val s = if (style == 0) "" else s""" s="$style""""
    v match {
      case null | "" => ""
      case Styled(inner, st) => cellXml(ref, inner, st)
      case n: Int => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Double if !n.isNaN && !n.isInfinite => s"""<c r="$ref"$s><v>$n</v></c>"""
      case other =>
        s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
    }
  }

  private def sheetXml(rows: Seq[Seq[Any]], freeze: (Int, Int),
      merges: Seq[String], hasComments: Boolean): String = {
    val body = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) => cellXml(s"${colRef(c)}${r + 1}", v) }
      s"""<row r="${r + 1}">${cs.mkString}</row>"""
    }.mkString
    // frozen header panes (the reference's freeze_panes/freeze_row)
    val (fr, fc) = freeze
    val views =
      if (fr <= 0 && fc <= 0) ""
      else {
        val y = if (fr > 0) s""" ySplit="$fr"""" else ""
        val x = if (fc > 0) s""" xSplit="$fc"""" else ""
        val tl = s"${colRef(fc)}${fr + 1}"
        s"""<sheetViews><sheetView workbookViewId="0"><pane$x$y topLeftCell="$tl" activePane="bottomRight" state="frozen"/></sheetView></sheetViews>"""
      }
    // schema order: sheetViews, sheetData, mergeCells, legacyDrawing
    val mergeXml =
      if (merges.isEmpty) ""
      else s"""<mergeCells count="${merges.length}">${
        merges.map(m => s"""<mergeCell ref="$m"/>""").mkString}</mergeCells>"""
    val legacy = if (hasComments) """<legacyDrawing r:id="rIdVml"/>""" else ""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">$views<sheetData>$body</sheetData>$mergeXml$legacy</worksheet>""".stripMargin
  }

  /** The classic comments part: one `<comment>` per (cellRef, text). */
  private def commentsXml(cs: Seq[(String, String)]): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<comments xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<authors><author></author></authors>
       |<commentList>${cs.map { case (ref, text) =>
           s"""<comment ref="$ref" authorId="0"><text><r><t xml:space="preserve">${esc(text)}</t></r></text></comment>"""
         }.mkString}</commentList>
       |</comments>""".stripMargin

  /** The VML drawing that gives each comment its (hidden) note shape —
    * required by the classic comments mechanism; without it most
    * readers show no comment at all. */
  private def vmlXml(cs: Seq[(String, String)]): String = {
    val shapes = cs.zipWithIndex.map { case ((ref, _), i) =>
      val (r, c) = parseRef(ref)
      s"""<v:shape id="_x0000_s${1025 + i}" type="#_x0000_t202" style="position:absolute;margin-left:80pt;margin-top:2pt;width:200pt;height:60pt;z-index:${i + 1};visibility:hidden" fillcolor="#ffffe1" o:insetmode="auto">
         |<v:fill color2="#ffffe1"/><v:shadow on="t" color="black" obscured="t"/>
         |<x:ClientData ObjectType="Note"><x:MoveWithCells/><x:SizeWithCells/><x:AutoFill>False</x:AutoFill><x:Row>$r</x:Row><x:Column>$c</x:Column></x:ClientData>
         |</v:shape>""".stripMargin
    }.mkString
    s"""<xml xmlns:v="urn:schemas-microsoft-com:vml" xmlns:o="urn:schemas-microsoft-com:office:office" xmlns:x="urn:schemas-microsoft-com:office:excel">
       |<o:shapelayout v:ext="edit"><o:idmap v:ext="edit" data="1"/></o:shapelayout>
       |<v:shapetype id="_x0000_t202" coordsize="21600,21600" o:spt="202" path="m,l,21600r21600,l21600,xe"><v:stroke joinstyle="miter"/><v:path gradientshapeok="t" o:connecttype="rect"/></v:shapetype>
       |$shapes
       |</xml>""".stripMargin
  }

  /** The styles part: number formats for counts, 2-dp, percent, 4-dp TPS
    * (reference formats at explore.py:1221-1296). Indices = [[Styles]]. */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="3">
      |<numFmt numFmtId="164" formatCode="#,##0"/>
      |<numFmt numFmtId="165" formatCode="#,##0.00"/>
      |<numFmt numFmtId="166" formatCode="#,##0.0000"/>
      |</numFmts>
      |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
      |<fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill></fills>
      |<borders count="1"><border/></borders>
      |<cellStyleXfs count="1"><xf/></cellStyleXfs>
      |<cellXfs count="5">
      |<xf numFmtId="0" applyNumberFormat="0"/>
      |<xf numFmtId="164" applyNumberFormat="1"/>
      |<xf numFmtId="165" applyNumberFormat="1"/>
      |<xf numFmtId="10" applyNumberFormat="1"/>
      |<xf numFmtId="166" applyNumberFormat="1"/>
      |</cellXfs>
      |</styleSheet>""".stripMargin

  /** Write `sheets` (name → rows of cells) as a valid .xlsx at `path`.
    * `freeze` maps a sheet name to its frozen (rows, cols);
    * `merges` maps a sheet name to its merged A1-ranges;
    * `comments` maps a sheet name to (cellRef, text) cell comments. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])],
      freeze: Map[String, (Int, Int)] = Map.empty,
      merges: Map[String, Seq[String]] = Map.empty,
      comments: Map[String, Seq[(String, String)]] = Map.empty): Unit = {
    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    val n = sheets.length
    val withComments = sheets.zipWithIndex.collect {
      case ((name, _), i) if comments.getOrElse(name, Nil).nonEmpty => (name, i + 1)
    }
    part("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Default Extension="vml" ContentType="application/vnd.openxmlformats-officedocument.vmlDrawing"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |${withComments.map { case (_, i) => s"""<Override PartName="/xl/comments$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.comments+xml"/>""" }.mkString("\n")}
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
         |<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
         |</Relationships>""".stripMargin)
    part("xl/styles.xml", stylesXml)
    sheets.zipWithIndex.foreach { case ((name, rows), i) =>
      val cs = comments.getOrElse(name, Nil)
      part(s"xl/worksheets/sheet${i + 1}.xml",
        sheetXml(rows, freeze.getOrElse(name, (0, 0)),
          merges.getOrElse(name, Nil), cs.nonEmpty))
      if (cs.nonEmpty) {
        part(s"xl/worksheets/_rels/sheet${i + 1}.xml.rels",
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
             |<Relationship Id="rIdCmt" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/comments" Target="../comments${i + 1}.xml"/>
             |<Relationship Id="rIdVml" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/vmlDrawing" Target="../drawings/vmlDrawing${i + 1}.vml"/>
             |</Relationships>""".stripMargin)
        part(s"xl/comments${i + 1}.xml", commentsXml(cs))
        part(s"xl/drawings/vmlDrawing${i + 1}.vml", vmlXml(cs))
      }
    }
    zip.close()
  }
}
