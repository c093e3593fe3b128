package graft

import java.io.{File, FileOutputStream}
import java.sql.Timestamp
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal deterministic OOXML writer for fixtures: enough of the
  * ECMA-376 package (workbook + rels + styles + shared strings + one
  * worksheet) to exercise every path of [[graft.sources.XlsxSource]].
  * Values: Timestamp → date-styled serial (numFmtId 22, the sample's
  * `m/d/yy h:mm`), Double → plain number, String → shared string,
  * null → omitted cell.
  */
object XlsxTestWriter {

  /** A numeric cell that references cellXfs style index 1 — lets tests
    * apply a custom number format (via `stylesOverride`) to a NUMBER,
    * exercising the date-vs-numeric style classification.
    */
  final case class Styled(v: Double)

  def toSerial(ts: Timestamp, date1904: Boolean = false): Double = {
    val millis = ts.getTime
    if (date1904) {
      val epoch1904 = -2082844800000L
      val days = Math.floorDiv(millis - epoch1904, 86400000L)
      val frac = Math.floorMod(millis - epoch1904, 86400000L) / 86400000.0
      days + frac
    } else {
      val epoch1900 = -2208988800000L
      val days = Math.floorDiv(millis - epoch1900, 86400000L)
      val frac = Math.floorMod(millis - epoch1900, 86400000L) / 86400000.0
      // inverse of the decoder's -2 adjustment (valid past 1900-03-01)
      days + 2 + frac
    }
  }

  private def colName(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def write(path: File, header: Seq[String], rows: Seq[Seq[Any]],
            date1904: Boolean = false,
            stylesOverride: Option[String] = None): Unit = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sstIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    val allRows: Seq[Seq[Any]] = header +: rows
    val sheetRows = allRows.zipWithIndex.map { case (cells, r) =>
      val cellXml = cells.zipWithIndex.flatMap { case (v, c) =>
        val ref = s"${colName(c)}${r + 1}"
        v match {
          case null => None
          case ts: Timestamp =>
            Some(s"""<c r="$ref" s="1"><v>${toSerial(ts, date1904)}</v></c>""")
          case XlsxTestWriter.Styled(d) =>
            Some(s"""<c r="$ref" s="1"><v>$d</v></c>""")
          case d: Double => Some(s"""<c r="$ref"><v>$d</v></c>""")
          case i: Int => Some(s"""<c r="$ref"><v>$i</v></c>""")
          case s: String => Some(s"""<c r="$ref" t="s"><v>${sstIdx(s)}</v></c>""")
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      }.mkString
      s"""<row r="${r + 1}">$cellXml</row>"""
    }.mkString

    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""".stripMargin

    val sstXml = {
      val sis = strings.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sis</sst>""".stripMargin
    }

    val stylesXml = stylesOverride.getOrElse(
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<cellXfs count="2"><xf numFmtId="0" applyNumberFormat="0"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
         |</styleSheet>""".stripMargin)

    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |${if (date1904) """<workbookPr date1904="1"/>""" else ""}
         |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin

    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |</Relationships>""".stripMargin

    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin

    val zout = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zout.putNextEntry(new ZipEntry(name))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/styles.xml", stylesXml)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
    } finally zout.close()
  }
}
