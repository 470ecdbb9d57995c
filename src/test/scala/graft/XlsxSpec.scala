package graft

import graft.sources.Xlsx
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Xlsx staging: typed round-trip through spark.read, positional column
  * preservation (blank holes stay blank), shared-string forms, the
  * A1-reference grammar, and the worksheet-part fallback. Fixtures are
  * hand-assembled SpreadsheetML zips — the same parts openpyxl writes. */
class XlsxSpec extends SparkSpec {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def zipWith(path: Path, entries: (String, String)*): Unit = {
    val z = new ZipOutputStream(Files.newOutputStream(path))
    try entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(UTF_8))
      z.closeEntry()
    } finally z.close()
  }

  private val boilerplate: Seq[(String, String)] = Seq(
    "[Content_Types].xml" ->
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin,
    "_rels/.rels" ->
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin,
    "xl/workbook.xml" ->
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets>
        |</workbook>""".stripMargin)

  /** Build a real xlsx: strings go through sharedStrings, numbers are
    * raw <v>, booleans t="b", None cells are omitted entirely. */
  private def writeXlsx(rows: Seq[Seq[Option[Any]]]): String = {
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int = sst.getOrElseUpdate(s, sst.size)
    val rowXml = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect { case (Some(v), ci) =>
        val ref = s"${colName(ci)}${ri + 1}"
        v match {
          case s: String => val i = sstIdx(s); s"""<c r="$ref" t="s"><v>$i</v></c>"""
          case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
          case n => s"""<c r="$ref"><v>$n</v></c>"""
        }
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$rowXml</sheetData></worksheet>""".stripMargin
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">
         |${sst.keys.map(s => s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>").mkString}
         |</sst>""".stripMargin
    val f = Files.createTempFile("graft_xlsx_fix", ".xlsx")
    zipWith(f, boilerplate ++ Seq(
      "xl/sharedStrings.xml" -> sstXml,
      "xl/worksheets/sheet1.xml" -> sheet): _*)
    f.toString
  }

  test("typed round-trip through spark.read: schema inference and tricky strings") {
    val p = writeXlsx(Seq(
      Seq(Some("name"), Some("score"), Some("ratio"), Some("flag"), Some("note")),
      Seq(Some("alpha"), Some(1), Some(1.5), Some(true), Some("hi, there")),
      Seq(Some("beta \"q\""), Some(2), Some(2.25), Some(false), None),
      Seq(Some("gamma\nnl"), Some(3), Some(-0.5), Some(true), Some("x"))))
    val staged = Xlsx.stageToCsv(p)
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .option("multiLine", "true").csv(staged)
    assert(df.columns.toSeq === Seq("name", "score", "ratio", "flag", "note"))
    val types = df.schema.fields.map(_.dataType.typeName).toSeq
    assert(types === Seq("string", "integer", "double", "boolean", "string"))
    val rows = df.orderBy("score").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "alpha" && rows(0).getString(4) === "hi, there")
    assert(rows(1).getString(0) === "beta \"q\"" && rows(1).isNullAt(4))
    assert(rows(2).getString(0) === "gamma\nnl" && rows(2).getDouble(2) === -0.5)
  }

  test("positional addressing: a skipped cell leaves its column blank") {
    val p = writeXlsx(Seq(
      Seq(Some("a"), Some("b"), Some("c")),
      Seq(Some("x1"), None, Some("z1")), // hole in the middle
      Seq(Some("x2"), Some("y2"), Some("z2"))))
    val df = spark.read.option("header", "true").csv(Xlsx.stageToCsv(p))
    val r = df.orderBy("a").collect()
    assert(r(0).getString(0) === "x1" && r(0).isNullAt(1) && r(0).getString(2) === "z1")
    assert(r(1).getString(1) === "y2")
  }

  test("rich-text shared strings concatenate their runs") {
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>pad</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="inlineStr"><is><t>inline!</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sst =
      """<?xml version="1.0"?><sst>
        |<si><t>plain</t></si>
        |<si><r><t>rich </t></r><r><t>text</t></r><rPh sb="0" eb="1"><t>IGNORED</t></rPh></si>
        |</sst>""".stripMargin
    val f = Files.createTempFile("graft_xlsx_rich", ".xlsx")
    zipWith(f, boilerplate ++ Seq(
      "xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet): _*)
    val df = spark.read.csv(Xlsx.stageToCsv(f.toString)).collect()
    assert(df(0).getString(0) === "plain")
    assert(df(1).getString(0) === "rich text", "runs concatenate, phonetics skipped")
    assert(df(1).getString(1) === "inline!")
  }

  test("A1-reference column grammar") {
    assert(Xlsx.colIndex("A") === 0)
    assert(Xlsx.colIndex("Z") === 25)
    assert(Xlsx.colIndex("AA") === 26)
    assert(Xlsx.colIndex("BC") === 54)
  }

  test("isXlsx decides on the URI path, not the query or case") {
    assert(Xlsx.isXlsx("https://h/f.xlsx"))
    assert(Xlsx.isXlsx("https://h/f.XLSX?sig=abc.csv"))
    assert(Xlsx.isXlsx("/local/dir/book.xlsx"))
    assert(!Xlsx.isXlsx("https://h/f.csv"))
    assert(!Xlsx.isXlsx("https://h/xlsx"))
  }

  test("corrupt inputs fail fast with a clean exception (server maps to the read-stage 500)") {
    // not a zip at all
    val junk = Files.createTempFile("graft_xlsx_junk", ".xlsx")
    Files.write(junk, "this is not a zip archive".getBytes(UTF_8))
    intercept[Exception] { Xlsx.stageToCsv(junk.toString) }
    // a zip with no worksheet part
    val empty = Files.createTempFile("graft_xlsx_empty", ".xlsx")
    zipWith(empty, "placeholder.txt" -> "nothing here")
    val e = intercept[IllegalArgumentException] { Xlsx.stageToCsv(empty.toString) }
    assert(e.getMessage.contains("worksheet"))
    // truncated zip bytes (half of a real workbook)
    val good = writeXlsx(Seq(Seq(Some("a")), Seq(Some("x"))))
    val bytes = Files.readAllBytes(java.nio.file.Path.of(good))
    val cut = Files.createTempFile("graft_xlsx_cut", ".xlsx")
    Files.write(cut, bytes.take(bytes.length / 2))
    intercept[Exception] { Xlsx.stageToCsv(cut.toString) }
  }

  test("worksheet fallback when sheet1.xml is absent") {
    val sheet = """<?xml version="1.0"?><worksheet><sheetData>
      |<row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>""".stripMargin
    val f = Files.createTempFile("graft_xlsx_fb", ".xlsx")
    zipWith(f, boilerplate ++ Seq("xl/worksheets/sheet99.xml" -> sheet): _*)
    val df = spark.read.csv(Xlsx.stageToCsv(f.toString)).collect()
    assert(df(0).getString(0) === "7")
  }

  test("worksheet fallback orders numerically: sheet2 beats sheet10") {
    def sheetWith(v: Int) = s"""<?xml version="1.0"?><worksheet><sheetData>
      |<row r="1"><c r="A1"><v>$v</v></c></row></sheetData></worksheet>""".stripMargin
    val f = Files.createTempFile("graft_xlsx_num", ".xlsx")
    // lexicographic order would pick sheet10 (value 10); numeric must pick sheet2
    zipWith(f, boilerplate ++ Seq(
      "xl/worksheets/sheet10.xml" -> sheetWith(10),
      "xl/worksheets/sheet2.xml" -> sheetWith(2)): _*)
    val df = spark.read.csv(Xlsx.stageToCsv(f.toString)).collect()
    assert(df(0).getString(0) === "2")
  }
}
