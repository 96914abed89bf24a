package graft.io

import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Minimal ODS (OpenDocument Spreadsheet) reader/writer — pure JVM, same
  * stance as [[Xlsx]]: the container is a zip, the sheet is
  * `content.xml` (ODF 1.2 `table:table` / `table:table-row` /
  * `table:table-cell`, with `table:number-columns-repeated` run-length
  * encoding). The reference reaches .ods through GDAL's driver
  * (internals.md driver table). First row = header, remaining rows =
  * string values; like xlsx, it is the attribute-table format of the
  * family (no geometry). */
object Ods {

  val Mimetype = "application/vnd.oasis.opendocument.spreadsheet"

  private def xmlReader(in: java.io.InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** All rows of the first table as string cells. `office:value` wins for
    * typed cells (floats keep their lexical form); otherwise the text:p
    * content. Repeated empty trailing cells/rows are dropped. */
  def rows(path: String): Vector[Array[String]] = {
    val zin = new ZipInputStream(java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(path.stripPrefix("file:"))))
    val out = Vector.newBuilder[Array[String]]
    try {
      var e: ZipEntry = zin.getNextEntry
      var done = false
      while (e != null && !done) {
        if (e.getName == "content.xml") {
          val r = xmlReader(zin)
          var tableSeen = false
          var inFirstTable = false
          var row: scala.collection.mutable.ArrayBuffer[String] = null
          var rowRepeat = 1
          var cellRepeat = 1
          var cellValue: String = null
          var inCell = false
          val text = new java.lang.StringBuilder
          while (r.hasNext && !done) r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "table" =>
                if (tableSeen) done = true // only the first sheet
                else { tableSeen = true; inFirstTable = true }
              case "table-row" if inFirstTable =>
                row = scala.collection.mutable.ArrayBuffer.empty[String]
                rowRepeat = 1
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "number-rows-repeated")
                    rowRepeat = r.getAttributeValue(i).toInt
                  i += 1
                }
              case "table-cell" if inFirstTable && row != null =>
                inCell = true; text.setLength(0); cellValue = null; cellRepeat = 1
                var i = 0
                while (i < r.getAttributeCount) {
                  r.getAttributeLocalName(i) match {
                    case "number-columns-repeated" => cellRepeat = r.getAttributeValue(i).toInt
                    case "value" => cellValue = r.getAttributeValue(i)
                    case "date-value" | "time-value" | "boolean-value" =>
                      if (cellValue == null) cellValue = r.getAttributeValue(i)
                    case _ =>
                  }
                  i += 1
                }
              case "covered-table-cell" if inFirstTable && row != null =>
                // merged-cell placeholders still occupy columns
                var rep = 1
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "number-columns-repeated")
                    rep = r.getAttributeValue(i).toInt
                  i += 1
                }
                var k = 0
                while (k < math.min(rep, 16384)) { row += null; k += 1 }
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS if inCell => text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "table-cell" if inCell =>
                inCell = false
                val v0 = if (cellValue != null) cellValue
                         else if (text.length() > 0) text.toString else null
                // run-length cells expand in place (interior null runs keep
                // column alignment); the 16k cap bounds writers that pad
                // rows to the ODF column maximum, and the trailing-null
                // trim below drops the padding again
                val rep = math.min(cellRepeat, 16384)
                var k = 0
                while (k < rep) { row += v0; k += 1 }
              case "table-row" if row != null =>
                // trim trailing nulls; keep non-empty rows, honoring
                // number-rows-repeated run-length encoding (bounded —
                // LibreOffice pads sheets with a million-row empty run)
                var end = row.length
                while (end > 0 && row(end - 1) == null) end -= 1
                if (end > 0) {
                  val cells = row.take(end).toArray
                  var k = 0
                  while (k < math.min(rowRepeat, 65536)) { out += cells; k += 1 }
                }
                row = null
              case "table" if inFirstTable => inFirstTable = false
              case _ =>
            }
            case _ =>
          }
        }
        if (!done) e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  // ----------------------------------------------------------------- write

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Write rows (header first) as a single-sheet .ods. The `mimetype`
    * entry is first and STORED uncompressed, as ODF 1.2 §3.3 requires. */
  def write(out: java.io.OutputStream, sheetName: String, rows: Iterator[Seq[String]]): Unit = {
    val zos = new ZipOutputStream(out)
    try {
      val mt = Mimetype.getBytes("UTF-8")
      val me = new ZipEntry("mimetype")
      me.setMethod(ZipEntry.STORED)
      me.setSize(mt.length)
      val crc = new java.util.zip.CRC32; crc.update(mt)
      me.setCrc(crc.getValue)
      zos.putNextEntry(me); zos.write(mt); zos.closeEntry()

      zos.putNextEntry(new ZipEntry("META-INF/manifest.xml"))
      zos.write(("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">""" +
        s"""<manifest:file-entry manifest:full-path="/" manifest:media-type="$Mimetype"/>""" +
        """<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>""" +
        """</manifest:manifest>""").getBytes("UTF-8"))
      zos.closeEntry()

      zos.putNextEntry(new ZipEntry("content.xml"))
      val sb = new java.lang.StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
        .append("""<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """)
        .append("""xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" """)
        .append("""xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" office:version="1.2">""")
        .append("""<office:body><office:spreadsheet>""")
        .append(s"""<table:table table:name="${xmlEsc(sheetName)}">""")
      rows.foreach { r =>
        sb.append("<table:table-row>")
        r.foreach { v =>
          if (v == null) sb.append("""<table:table-cell/>""")
          else sb.append("""<table:table-cell office:value-type="string"><text:p>""")
            .append(xmlEsc(v)).append("</text:p></table:table-cell>")
        }
        sb.append("</table:table-row>")
      }
      sb.append("</table:table></office:spreadsheet></office:body></office:document-content>")
      zos.write(sb.toString.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
