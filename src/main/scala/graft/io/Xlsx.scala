package graft.io

import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/**
 * Minimal XLSX (Office Open XML spreadsheet) reader/writer — pure JVM: the
 * container is a zip (java.util.zip) and the parts are XML (StAX). The
 * reference reaches .xlsx through GDAL's driver (st_read_xlsx.test); this
 * covers the same tabular interchange: first row = header, remaining rows =
 * values. No geometry — xlsx is the attribute-table format of the family.
 */
object Xlsx {

  // ------------------------------------------------------------------ read

  private def xmlReader(in: java.io.InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** column index from an A1-style cell reference ("C7" → 2) */
  private def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** All rows of the first worksheet as string cells (sparse cells padded
    * with null). Shared strings and inline strings both supported. */
  def rows(path: String): Vector[Array[String]] = {
    def open() = new ZipInputStream(java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(path.stripPrefix("file:"))))

    // pass 1: shared strings (optional part)
    val shared = scala.collection.mutable.ArrayBuffer.empty[String]
    locally {
      val zin = open()
      try {
        var e: ZipEntry = zin.getNextEntry
        while (e != null) {
          if (e.getName == "xl/sharedStrings.xml") {
            val r = xmlReader(zin)
            val sb = new java.lang.StringBuilder
            var inSi = false
            while (r.hasNext) r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                if (r.getLocalName == "si") { inSi = true; sb.setLength(0) }
              case XMLStreamConstants.CHARACTERS => if (inSi) sb.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                if (r.getLocalName == "si") { shared += sb.toString; inSi = false }
              case _ =>
            }
          }
          e = zin.getNextEntry
        }
      } finally zin.close()
    }

    // pass 2: first worksheet
    val out = Vector.newBuilder[Array[String]]
    val zin = open()
    try {
      var e: ZipEntry = zin.getNextEntry
      var done = false
      while (e != null && !done) {
        if (e.getName.matches("xl/worksheets/sheet1?\\.xml")) {
          val r = xmlReader(zin)
          var row = scala.collection.mutable.ArrayBuffer.empty[String]
          var cellCol = -1
          var cellType = ""
          var text = new java.lang.StringBuilder
          var inV = false
          var inT = false
          while (r.hasNext) r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                  .getOrElse(row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                text.setLength(0)
              case "v" => inV = true
              case "t" => inT = true
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS =>
              if (inV || inT) text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "v" => inV = false
              case "t" => inT = false
              case "c" =>
                val v = cellType match {
                  case "s" => shared.lift(text.toString.trim.toInt).orNull
                  case _ => text.toString
                }
                while (row.length <= cellCol) row += null
                row(cellCol) = v
              case "row" => out += row.toArray
              case _ =>
            }
            case _ =>
          }
          done = true
        }
        if (!done) e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // ----------------------------------------------------------------- write

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write header + rows as a single-sheet workbook. `numeric(i)` marks
    * columns stored as numbers (t="n"); everything else is inline strings. */
  def write(out: java.io.OutputStream, header: Seq[String],
            rows: Iterator[Seq[Any]], numeric: Int => Boolean): Unit = {
    val z = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.OutputStreamWriter(z, "UTF-8")
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(rRef: String, v: Any, num: Boolean): String =
      if (v == null) ""
      else if (num) s"""<c r="$rRef" t="n"><v>${String.valueOf(v)}</v></c>"""
      else s"""<c r="$rRef" t="inlineStr"><is><t>${xmlEsc(String.valueOf(v))}</t></is></c>"""
    w.write("<row r=\"1\">" + header.zipWithIndex.map { case (h, i) =>
      cell(s"${colRef(i)}1", h, num = false)
    }.mkString + "</row>")
    var rn = 2
    rows.foreach { vals =>
      w.write(s"""<row r="$rn">""" + vals.zipWithIndex.map { case (v, i) =>
        cell(s"${colRef(i)}$rn", v, numeric(i))
      }.mkString + "</row>")
      rn += 1
    }
    w.write("</sheetData></worksheet>")
    w.flush()
    z.closeEntry()
    z.finish()
  }
}
