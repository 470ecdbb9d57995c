package graft.sources

import java.io.File
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Excel (.xlsx) ingest — the reference product is an Excel tool and
  * ships openpyxl (requirements.txt:47) even though its pipeline only
  * reads CSV; a CSV-enrichment user's next file IS an .xlsx. Same
  * driver-side staging split as [[UrlStaging]]: the workbook is
  * converted ONCE on the driver to a temp CSV that `spark.read.csv`
  * then consumes distributed. An .xlsx is a zip of XML parts
  * (ECMA-376 / ISO 29500 SpreadsheetML — a public format), parsed here
  * with the JDK's own ZipFile + StAX: streaming, one row in memory at a
  * time, no third-party dependency.
  *
  * Scope (the compatibility path, not a full SpreadsheetML engine):
  * first worksheet, shared + inline strings, numbers as Excel stores
  * them (raw lexical form), booleans as true/false. Positional column
  * addressing is preserved — cell refs (`C7`) place values in their
  * sheet column, so blank cells stay blank and the reference's
  * column-INDEX contract (test.py:151) carries over unchanged. Date
  * serials arrive as the underlying number (documented Excel behavior
  * without format resolution); formula cells yield their cached value.
  */
object Xlsx {

  /** Does the URL/path name an xlsx? Decided on the URI path with any
    * query string stripped — `https://…/f.xlsx?sig=…` is still xlsx. */
  def isXlsx(urlOrPath: String): Boolean = {
    val path = try Option(URI.create(urlOrPath).getPath).getOrElse(urlOrPath)
    catch { case _: IllegalArgumentException => urlOrPath }
    path.toLowerCase.endsWith(".xlsx")
  }

  /** Convert the first worksheet to a temp CSV; returns a path
    * `spark.read.csv` can consume (same contract as
    * [[UrlStaging.stage]]). Accepts a plain path or a file: URI. */
  def stageToCsv(xlsxPath: String): String = {
    val file =
      if (xlsxPath.startsWith("file:")) new File(URI.create(xlsxPath))
      else new File(xlsxPath)
    val out = Files.createTempFile("graft_xlsx_", ".csv")
    val zip = new ZipFile(file)
    try {
      val shared = readSharedStrings(zip)
      val sheetName = firstSheetEntry(zip)
      val entry = zip.getEntry(sheetName)
      require(entry != null, s"no worksheet found in $xlsxPath")
      val writer = Files.newBufferedWriter(out, StandardCharsets.UTF_8)
      try writeSheetAsCsv(newReader(zip, sheetName), shared, writer)
      finally writer.close()
    } finally zip.close()
    out.toUri.toString
  }

  /** The first worksheet part. openpyxl/pandas write `sheet1.xml`; when
    * absent, the NUMERICALLY first xml part under `xl/worksheets/` stands
    * in — lexicographic order would pick sheet10.xml over sheet2.xml
    * (full fidelity would chase workbook.xml's relationship ids — out of
    * scope for the staging path). */
  private def firstSheetEntry(zip: ZipFile): String = {
    if (zip.getEntry("xl/worksheets/sheet1.xml") != null) "xl/worksheets/sheet1.xml"
    else {
      // sort key: (embedded number if any else MaxValue, full name) — so
      // sheet2 < sheet10, and non-numeric names fall back to lexicographic
      def key(n: String): (Long, String) = {
        val digits = n.substring(n.lastIndexOf('/') + 1).filter(_.isDigit)
        (if (digits.isEmpty) Long.MaxValue else digits.toLong, n)
      }
      val it = zip.entries()
      var best: String = null
      while (it.hasMoreElements) {
        val n = it.nextElement().getName
        if (n.startsWith("xl/worksheets/") && n.endsWith(".xml") &&
            !n.contains("/_rels/") &&
            (best == null || Ordering[(Long, String)].lt(key(n), key(best)))) best = n
      }
      require(best != null, "xlsx has no xl/worksheets/*.xml part")
      best
    }
  }

  /** Hardened StAX reader: DTDs and external entities off (an xlsx from
    * an arbitrary URL is untrusted input — no XXE). */
  private def newReader(zip: ZipFile, entryName: String): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.createXMLStreamReader(zip.getInputStream(zip.getEntry(entryName)))
  }

  /** sharedStrings.xml -> indexed strings. A <si> is either one <t> or
    * rich-text runs (<r><t>..</t></r>...) whose texts concatenate;
    * phonetic <rPh> runs are skipped. */
  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return Vector.empty
    val r = newReader(zip, "xl/sharedStrings.xml")
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    var phoneticDepth = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => sb.clear()
              case "rPh" => phoneticDepth += 1
              case "t" if phoneticDepth == 0 => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => out += sb.toString
              case "rPh" => phoneticDepth -= 1
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** `"BC"` -> 54 (0-based). */
  private[graft] def colIndex(letters: String): Int = {
    var i = 0
    var acc = 0
    while (i < letters.length) { acc = acc * 26 + (letters.charAt(i) - 'A' + 1); i += 1 }
    acc - 1
  }

  private def writeSheetAsCsv(r: XMLStreamReader, shared: IndexedSeq[String],
                              w: java.io.Writer): Unit = {
    val row = ArrayBuffer.empty[String] // dense, index = sheet column
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    var firstRow = true

    def put(col: Int, value: String): Unit = {
      while (row.length <= col) row += ""
      row(col) = value
    }
    // Spark's csv reader defaults to quote='"' escape='\' (univocity),
    // NOT RFC-4180 doubled quotes — escape for THAT dialect, since the
    // staged file's one consumer is spark.read.csv with default options
    // (embedded newlines additionally need .option("multiLine", true))
    def csvEscape(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r' || c == '\\'))
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
    def flushRow(): Unit = {
      if (!firstRow) w.write("\n")
      firstRow = false
      w.write(row.map(csvEscape).mkString(","))
      row.clear()
    }
    def cellValue(): String = cellType match {
      case "s" =>
        val t = text.toString.trim
        if (t.isEmpty) ""
        else {
          val i = t.toInt
          if (i >= 0 && i < shared.length) shared(i) else ""
        }
      case "b" => if (text.toString.trim == "1") "true" else "false"
      case "e" => "" // error cells (#DIV/0! etc.) stage as blank
      case _ => text.toString // n (default), str (cached formula), inlineStr
    }

    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => // row cells accumulate; r attr not needed
              case "c" =>
                val ref = r.getAttributeValue(null, "r")
                cellCol =
                  if (ref != null) colIndex(ref.takeWhile(Character.isLetter))
                  else row.length // no ref attr -> next column
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text.clear()
              case "v" => inV = true
              case "t" => inIsT = true // inside <is> inline string
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inIsT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" => flushRow()
              case "c" => if (cellCol >= 0) { put(cellCol, cellValue()); cellCol = -1 }
              case "v" => inV = false
              case "t" => inIsT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
  }
}
