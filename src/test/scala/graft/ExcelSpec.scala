package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.Excel

/** XLSX connector over a workbook assembled from raw OOXML parts —
  * shared strings, inline strings, numbers, booleans, cached formula
  * values, sparse cells, multiple sheets.
  */
class ExcelSpec extends SparkSpec {

  private def writeXlsx(dir: java.nio.file.Path, name: String): String = {
    val file = dir.resolve(name).toFile
    val z = new ZipOutputStream(new FileOutputStream(file))
    def put(entry: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(entry))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="People" sheetId="1"/><sheet name="Totals" sheetId="2"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>name</t></si><si><t>age</t></si><si><t>active</t></si>
        |<si><t>ada</t></si><si><r><t>grace </t></r><r><t>hopper</t></r></si>
        |</sst>""".stripMargin)
    // row 2: shared string, number, boolean; row 3: rich-text shared
    // string, sparse gap in B, formula with cached value in C
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>36</v></c><c r="C2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="C3"><f>SUM(B2)</f><v>85.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>total</t></is></c><c r="B1"><v>121.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    file.getAbsolutePath
  }

  test("readXlsx decodes sheets, cell types, sparse gaps, and cached formulas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx")
    writeXlsx(dir, "book.xlsx")
    val rows = Excel.readXlsx(spark, dir.toString)
    val bySheet = rows.collect().map(r =>
      (r.getString(1), r.getLong(2)) -> r.getSeq[String](3)).toMap
    assert(bySheet(("People", 1L)) == Seq("name", "age", "active"))
    assert(bySheet(("People", 2L)) == Seq("ada", "36", "true"))
    assert(bySheet(("People", 3L)) == Seq("grace hopper", null, "85.5"),
      "rich text concatenates, gaps are null, formulas use the cached value")
    assert(bySheet(("Totals", 1L)) == Seq("total", "121.5"))
  }

  test("toTable promotes the header row and parallelizes per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx2")
    writeXlsx(dir, "b1.xlsx")
    writeXlsx(dir, "b2.xlsx")
    val rows = Excel.readXlsx(spark, dir.toString)
    val table = Excel.toTable(rows, "People")
    assert(table.columns.toSeq == Seq("path", "row_num", "name", "age", "active"))
    assert(table.count() == 4) // 2 data rows x 2 files
    val ages = table.filter(col("name") === "ada").select("age")
      .collect().map(_.getString(0)).toSeq
    assert(ages == Seq("36", "36"))
  }

  test("column reference arithmetic: A=1, Z=26, AA=27, BC=55") {
    assert(Excel.colIndex("A1") == 1)
    assert(Excel.colIndex("Z9") == 26)
    assert(Excel.colIndex("AA12") == 27)
    assert(Excel.colIndex("BC3") == 55)
  }
}
