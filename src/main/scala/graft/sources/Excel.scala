package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable
import scala.xml.XML

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed XLSX reader (ref connectors/unstructured/documents.py:181
  * `_extract_excel` — openpyxl with data_only=True: sheet names in
  * workbook order, rows of stringified cell values).
  *
  * No spreadsheet library exists on this classpath, but XLSX is a zip
  * of XML parts, and both primitives are JVM-native — so this is a real
  * parser, not a stub: shared strings, inline strings, booleans,
  * numbers, and cached formula VALUES (the data_only contract) all
  * decode. Dates surface as their raw Excel serial numbers (style-table
  * date detection is out of scope and documented, not guessed at).
  *
  * Scale shape: one task per FILE (binaryFile source → flatMap over
  * rows), so a directory of thousands of workbooks parses with full
  * parallelism; a single multi-GB workbook is inherently one task —
  * the format is not splittable, which is exactly why bulk data lands
  * in parquet and Excel stays an EDGE connector (same stance as the
  * reference, where Excel is an unstructured-ingest format).
  */
object Excel {

  /** One row per sheet row: (path, sheet, row_num, cells) with `cells`
    * positionally dense from column A (nulls for gaps), mirroring
    * openpyxl's `iter_rows(values_only=True)`. */
  def readXlsx(spark: SparkSession, path: String, globFilter: String = "*.xlsx"): DataFrame =
    fromBinary(Connectors.readBinaryFiles(spark, path, Some(globFilter)))

  /** Same, over an already-loaded binaryFile frame (path, content). */
  def fromBinary(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseWorkbook(bytes).flatMap { case (sheet, rows) =>
          rows.map { case (rowNum, cells) => (path, sheet, rowNum, cells) }
        }
      }
      .toDF("path", "sheet", "row_num", "cells")
  }

  /** Promote a sheet's first row to column names →
    * (path, row_num, named string columns). Column count and names come
    * from the header row of the FIRST file (schema must be decided once,
    * driver-side — the usual many-files-one-schema ingest contract). */
  def toTable(sheetRows: DataFrame, sheet: String): DataFrame = {
    val forSheet = sheetRows.filter(col("sheet") === sheet)
    val header = forSheet.orderBy("path", "row_num")
      .select("cells").limit(1).collect()
      .headOption.map(_.getSeq[String](0))
      .getOrElse(throw new IllegalArgumentException(s"sheet $sheet has no rows"))
    val named = header.zipWithIndex.map { case (h, i) =>
      element_at(col("cells"), i + 1)
        .as(Option(h).filter(_.nonEmpty).getOrElse(s"_c$i"))
    }
    forSheet.filter(col("row_num") > 1)
      .select((Seq(col("path"), col("row_num")) ++ named): _*)
  }

  // ---- pure-JVM xlsx parsing (runs inside executor tasks) ----

  /** → (sheetName, rows: (row_num, cells)) in workbook order. */
  private[graft] def parseWorkbook(bytes: Array[Byte]): Seq[(String, Seq[(Long, Seq[String])])] = {
    val parts = readZip(bytes)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml") match {
      case Some(ss) =>
        (XML.loadString(new String(ss, "UTF-8")) \ "si")
          .map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }
    // workbook.xml lists sheet NAMES in order; worksheet parts are
    // xl/worksheets/sheetN.xml — zip the two sequences (standard
    // writers emit them aligned; on mismatch fall back to part names)
    val declared = parts.get("xl/workbook.xml").toSeq.flatMap { wb =>
      (XML.loadString(new String(wb, "UTF-8")) \ "sheets" \ "sheet")
        .map(s => (s \ "@name").text)
    }
    val sheetParts = parts.keys.toSeq
      .filter(n => n.matches("xl/worksheets/sheet\\d+\\.xml"))
      .sortBy(n => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toInt)
    val names =
      if (declared.size == sheetParts.size) declared
      else sheetParts.map(_.stripPrefix("xl/worksheets/").stripSuffix(".xml"))
    names.zip(sheetParts).map { case (name, part) =>
      name -> parseSheet(parts(part), shared)
    }
  }

  private def parseSheet(
      xml: Array[Byte], shared: IndexedSeq[String]): Seq[(Long, Seq[String])] = {
    val rows = XML.loadString(new String(xml, "UTF-8")) \ "sheetData" \ "row"
    rows.map { row =>
      val rowNum = (row \ "@r").text.toLong
      val cells = mutable.ArrayBuffer.empty[String]
      var nextIdx = 1 // cells without an r attribute are sequential
      (row \ "c").foreach { c =>
        val ref = (c \ "@r").text
        val idx = if (ref.nonEmpty) colIndex(ref) else nextIdx
        while (cells.size < idx) cells += null
        cells(idx - 1) = cellValue(c, shared)
        nextIdx = idx + 1
      }
      rowNum -> cells.toSeq
    }
  }

  /** Cell → string value, per the ECMA-376 `t` attribute. Formula
    * cells use their CACHED <v> (openpyxl data_only=True semantics). */
  private def cellValue(c: scala.xml.Node, shared: IndexedSeq[String]): String = {
    val v = (c \ "v").text
    (c \ "@t").text match {
      case "s"         => shared.lift(v.toInt).orNull // shared string
      case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
      case "b"         => if (v == "1") "true" else "false"
      case _           => if (v.isEmpty) null else v // n / str / e
    }
  }

  /** "BC12" → 1-based column index of "BC" (A=1, Z=26, AA=27 …). */
  private[graft] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1))

  /** Shared OOXML-container reader (also used by
    * [[graft.multimodal.Office]] for docx/pptx). */
  private[graft] def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }
}
