package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.multimodal.Office

/** DOCX/PPTX extraction against OOXML containers built in-test. */
class OfficeSpec extends SparkSpec {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  private val wNs = """xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main""""

  test("docx: run concatenation, empty-paragraph drop, table paragraphs excluded") {
    val doc =
      s"""<w:document $wNs><w:body>
          <w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
          <w:p><w:r><w:t>   </w:t></w:r></w:p>
          <w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
          <w:p><w:r><w:t>Second paragraph</w:t></w:r></w:p>
          </w:body></w:document>"""
    val out = Office.extractDocx(zip("word/document.xml" -> doc))
    // python-docx doc.paragraphs: top-level only, blanks dropped,
    // "\n\n" joined (documents.py:137-138)
    assert(out == Right((2, "Hello world\n\nSecond paragraph")))
  }

  test("pptx: shape text per slide, slides joined with ---, numeric part order") {
    val aNs = """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" """ +
      """xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main""""
    def slide(shapes: Seq[Seq[String]]): String =
      s"""<p:sld $aNs><p:cSld><p:spTree>${
        shapes.map(paras =>
          s"<p:sp><p:txBody>${paras.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString}</p:txBody></p:sp>"
        ).mkString
      }<p:sp><p:spPr/></p:sp></p:spTree></p:cSld></p:sld>""" // last shape: no text frame
    val pptx = zip(
      "ppt/slides/slide2.xml" -> slide(Seq(Seq("Second slide"))),
      "ppt/slides/slide1.xml" -> slide(Seq(Seq("Title", "Subtitle"), Seq("Body"))),
      "ppt/slides/slide10.xml" -> slide(Seq(Seq("Tenth"))))
    val out = Office.extractPptx(pptx)
    // slide1: shape1 "Title\nSubtitle" + shape2 "Body" joined "\n";
    // slides in NUMERIC order (1, 2, 10) joined "\n\n---\n\n"
    assert(out == Right((3, "Title\nSubtitle\nBody\n\n---\n\nSecond slide\n\n---\n\nTenth")))
  }

  test("error contracts: wrong container, corrupt bytes") {
    assert(Office.extractDocx(zip("other.xml" -> "<a/>")).left.exists(_.contains("not a docx")))
    assert(Office.extractPptx(zip("other.xml" -> "<a/>")).left.exists(_.contains("not a pptx")))
    assert(Office.extractDocx("junk".getBytes).isLeft)
  }

  test("DataFrame seams land text + counts; extracted text feeds TextAnalysis") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val doc = s"""<w:document $wNs><w:body>
        <w:p><w:r><w:t>the quick brown fox</w:t></w:r></w:p>
        <w:p><w:r><w:t>and the lazy dog</w:t></w:r></w:p>
        </w:body></w:document>"""
    val df = Seq(("a.docx", zip("word/document.xml" -> doc)), ("bad.docx", "x".getBytes))
      .toDF("path", "content")
    val out = Office.docxFromBinary(df).orderBy("path").collect()
    assert(out(0).getAs[String]("text") == "the quick brown fox\n\nand the lazy dog")
    assert(out(0).getAs[Long]("paragraph_count") == 2 && out(0).getAs[String]("error") == null)
    assert(out(1).getAs[String]("text") == null && out(1).getAs[String]("error") != null)
    // downstream composition: q97's language id runs unchanged on it
    val lang = Office.docxFromBinary(df).filter(col("error").isNull)
      .select(graft.text.TextAnalysis.languageId(col("text")).as("lang")).collect()
    assert(lang.head.getString(0) == "en")
  }
}
