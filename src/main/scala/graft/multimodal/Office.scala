package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Excel.readZip

/** Word/PowerPoint text extraction (ref connectors/unstructured/
  * documents.py:131 `_extract_word`, :158 `_extract_powerpoint`).
  *
  * The reference needs python-docx / python-pptx and error-tags when
  * they are missing. Neither library exists here — but DOCX and PPTX
  * are OOXML zip containers (same primitive stack as
  * [[graft.sources.Excel]]: `java.util.zip` + `scala.xml`), so both
  * extractors are real parsers, closing the last two declared
  * unstructured-format seams. Output contracts mirror the reference
  * exactly:
  *
  *   - word: non-empty top-level body paragraphs (`<w:p>` run text
  *     concatenated — table-cell paragraphs excluded, matching
  *     python-docx's `doc.paragraphs`), joined "\n\n", plus
  *     `paragraph_count` (documents.py:137-151);
  *   - powerpoint: per slide, text-bearing shapes (`<p:sp>` with a
  *     `<p:txBody>`; a shape's `<a:p>` paragraphs join "\n" like
  *     python-pptx's `shape.text`) join "\n", slides join
  *     "\n\n---\n\n", plus `slide_count` (documents.py:164-174).
  *
  * Scale shape: one task per FILE (binaryFile source → map over rows)
  * — the Excel/Pdf stance; OOXML is not splittable, extracted text in
  * parquet is what flows onward to q97–q99.
  */
object Office {

  /** DOCX payload rows → (path, doc_format, text, paragraph_count,
    * error). */
  def docxFromBinary(
      binary: DataFrame, pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        extractDocx(bytes) match {
          case Right((n, text)) => (path, "word", text, n.toLong, null: String)
          case Left(err)        => (path, "word", null: String, 0L, err)
        }
      }
      .toDF(pathCol, "doc_format", "text", "paragraph_count", "error")
  }

  /** PPTX payload rows → (path, doc_format, text, slide_count, error). */
  def pptxFromBinary(
      binary: DataFrame, pathCol: String = "path", payloadCol: String = "content"): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        extractPptx(bytes) match {
          case Right((n, text)) => (path, "powerpoint", text, n.toLong, null: String)
          case Left(err)        => (path, "powerpoint", null: String, 0L, err)
        }
      }
      .toDF(pathCol, "doc_format", "text", "slide_count", "error")
  }

  // ---- byte-level parsers (run inside executor tasks) ----

  /** → Right((paragraphCount, text)) or Left(error). */
  private[graft] def extractDocx(bytes: Array[Byte]): Either[String, (Int, String)] =
    try {
      val parts = readZip(bytes)
      parts.get("word/document.xml") match {
        case None => Left("not a docx (word/document.xml missing)")
        case Some(doc) =>
          val body = scala.xml.XML.loadString(new String(doc, "UTF-8")) \ "body"
          // direct children only: table paragraphs live under w:tbl and
          // are NOT in python-docx's doc.paragraphs (documents.py:137)
          val paragraphs = (body \ "p")
            .map(p => (p \\ "t").map(_.text).mkString)
            .filter(_.trim.nonEmpty)
          Right((paragraphs.size, paragraphs.mkString("\n\n")))
      }
    } catch { case e: Exception => Left(s"docx parse failed: ${e.getMessage}") }

  /** → Right((slideCount, text)) or Left(error). */
  private[graft] def extractPptx(bytes: Array[Byte]): Either[String, (Int, String)] =
    try {
      val parts = readZip(bytes)
      val slideParts = parts.keys.toSeq
        .filter(_.matches("ppt/slides/slide\\d+\\.xml"))
        .sortBy(_.stripPrefix("ppt/slides/slide").stripSuffix(".xml").toInt)
      if (slideParts.isEmpty) Left("not a pptx (no ppt/slides/slideN.xml parts)")
      else {
        val slides = slideParts.map { part =>
          val xml = scala.xml.XML.loadString(new String(parts(part), "UTF-8"))
          // shapes with a text frame; shape.text = its a:p paragraphs
          // joined "\n" (python-pptx semantics, documents.py:166-169).
          // Descendant search deliberately includes shapes nested in
          // group shapes — python-pptx's top-level loop SKIPS grouped
          // text, which is a text-extraction loss, not a behavior worth
          // preserving (the reference's own goal is "all slide text").
          (xml \\ "sp")
            .flatMap { sp =>
              val tb = sp \ "txBody"
              if (tb.isEmpty) None
              else Some((tb \ "p").map(p => (p \\ "t").map(_.text).mkString).mkString("\n"))
            }
            .mkString("\n")
        }
        Right((slides.size, slides.mkString("\n\n---\n\n")))
      }
    } catch { case e: Exception => Left(s"pptx parse failed: ${e.getMessage}") }
}
