package graft

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.apache.spark.sql.functions._

import graft.multimodal.Pdf

/** PDF extraction: byte-level parser + DataFrame seam.
  * Fixtures are constructed in-test from the PDF grammar — including a
  * genuinely Flate-compressed content stream — so the parser is proven
  * against real deflate bytes, not just the uncompressed q103 path. */
class PdfSpec extends SparkSpec {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal single-page PDF around one content stream. */
  private def onePagePdf(content: Array[Byte], filter: String = ""): Array[Byte] = {
    val head =
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${content.length}$filter >>\nstream\n").getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n".getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(content); out.write(tail)
    out.toByteArray
  }

  private def textOf(bytes: Array[Byte]): (Int, String) =
    Pdf.extractText(bytes).fold(e => fail(s"extract failed: $e"), identity)

  test("uncompressed single page: Tj text with Td line breaks") {
    val pdf = onePagePdf("BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -14 Td (world) Tj ET".getBytes("UTF-8"))
    assert(textOf(pdf) == (1, "Hello\nworld"))
  }

  test("FlateDecode stream inflates through java.util.zip") {
    val stream = "BT (compressed) Tj 0 -14 Td (content) Tj ET".getBytes("UTF-8")
    val pdf = onePagePdf(deflate(stream), filter = " /Filter /FlateDecode")
    assert(textOf(pdf) == (1, "compressed\ncontent"))
  }

  test("TJ arrays, hex strings, quote operator, and escape forms decode") {
    val content =
      "BT [(Ker) -20 (ned)] TJ 0 -14 Td (a\\(b\\)c\\\\d) Tj (next line) ' " +
        "0 -14 Td <48692C20686578> Tj 0 -14 Td (oct\\101l) Tj ET"
    val pdf = onePagePdf(content.getBytes("UTF-8"))
    assert(textOf(pdf) == (1, "Kerned\na(b)c\\d\nnext line\nHi, hex\noctAl"))
  }

  test("multi-page Kids order wins over object order") {
    // page objects are declared 6 before 5, Kids says [5, 6]
    val pdf =
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [5 0 R 6 0 R] /Count 2 >>\nendobj\n" +
        "6 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>\nendobj\n" +
        "5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>\nendobj\n" +
        "7 0 obj\n<< /Length 16 >>\nstream\nBT (first) Tj ET\nendstream\nendobj\n" +
        "8 0 obj\n<< /Length 17 >>\nstream\nBT (second) Tj ET\nendstream\nendobj\n" +
        "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(textOf(pdf) == (2, "first\nsecond"))
  }

  test("error contracts: non-PDF, encrypted, image-only") {
    assert(Pdf.extractText("PKnot a pdf".getBytes("ISO-8859-1")).left.exists(_.contains("not a PDF")))
    val enc = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.extractText(enc).left.exists(_.contains("encrypted")))
    val imageOnly = onePagePdf("q 100 0 0 100 0 0 cm /Im1 Do Q".getBytes("UTF-8"))
    assert(Pdf.extractText(imageOnly).left.exists(_.contains("image-only")))
  }

  test("fromBinary lands (path, doc_format, n_pages, text, error) rows") {
    import spark.implicits._
    val good = onePagePdf("BT (ok) Tj ET".getBytes("UTF-8"))
    val bad = "nope".getBytes("UTF-8")
    val df = Seq(("a.pdf", good), ("b.pdf", bad)).toDF("path", "content")
    val out = Pdf.fromBinary(df).orderBy("path").collect()
    assert(out(0).getAs[String]("text") == "ok" && out(0).getAs[Long]("n_pages") == 1L)
    assert(out(0).getAs[String]("error") == null)
    assert(out(1).getAs[String]("text") == null && out(1).getAs[String]("error") != null)
  }

  test("property: random text round-trips through build→escape→parse (seeded)") {
    // strings drawn from a hostile alphabet: parens (nested + unbalanced),
    // backslashes, newlines, tabs, digits — everything the literal-string
    // grammar has to escape or pass through
    val alphabet = "ab c(d)e\\f\n\tg0(9"
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val text = Seq.fill(1 + rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val escaped = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      val content = s"BT ($escaped) Tj ET".getBytes("UTF-8")
      val pdf = onePagePdf(content)
      Pdf.extractText(pdf) match {
        case Right((1, got)) => assert(got == text, s"seed=$seed: ${got} != ${text}")
        case Right((n, _))   => fail(s"seed=$seed: $n pages")
        case Left(err) =>
          // an all-whitespace draw legitimately error-tags as image-only
          assert(text.trim.isEmpty && err.contains("image-only"), s"seed=$seed: $err")
      }
    }
  }

  test("q103 query matches its oracle reconstruction on sf0.001") {
    val q = SparkEntry.queries("q103_pdf_extract")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"), lit("pdf").as("doc_format"), lit(2L).as("n_pages"),
      concat(lit("Doc "), col("doc_id"), lit("\n"), col("text"),
        lit("\nEnd of doc "), col("doc_id")).as("text"))
    assert(q.exceptAll(docs).isEmpty && docs.exceptAll(q).isEmpty)
  }
}
