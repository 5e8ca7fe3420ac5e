package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM PDF text extraction (ref connectors/unstructured/pdf.py:1-246
  * — pypdf/pdfminer when installed, error-tag when not).
  *
  * No PDF library exists on this classpath, but the two primitives a
  * text extractor needs are JVM-native: FlateDecode is
  * `java.util.zip.Inflater`, and page text lives in BT/ET operator
  * blocks of the content stream — so, like [[graft.sources.Excel]],
  * this is a real first-principles parser, not a stub.
  *
  * What it implements:
  *   - object scan without the xref table (repair-mode stance: objects
  *     are located by their `N G obj` headers, so PDFs with broken or
  *     absent cross-reference tables still parse — `/Length` slices
  *     stream payloads exactly when present, with an `endstream` scan
  *     fallback);
  *   - the Catalog → Pages → Kids page tree (nested Pages nodes
  *     supported), falling back to /Type /Page objects in object order
  *     when no catalog resolves;
  *   - per-page content streams (single ref or array), FlateDecode or
  *     uncompressed;
  *   - the text show operators Tj, TJ (array form; kerning numbers
  *     skipped), ' and ", with Td/TD/T* treated as line breaks, and
  *     both literal `(...)` strings (all escape forms: \n \r \t \b \f
  *     octal, nested parens, line continuation) and `<...>` hex
  *     strings.
  *
  * Honest seams (error-tagged or documented, never guessed):
  *   - encrypted PDFs (`/Encrypt`) error-tag — RC4/AES decryption is a
  *     crypto stack, not a parsing gap;
  *   - string bytes decode as UTF-8 (ASCII-transparent); font
  *     ToUnicode CMap remapping for subset-embedded fonts is out of
  *     scope, same as the reference's regex fallback path;
  *   - image-only pages yield no text; a document with NO text at all
  *     error-tags as image-only.
  *
  * Scale shape: one task per FILE (binaryFile source → map over rows),
  * identical to [[graft.sources.Excel]] — a corpus of millions of PDFs
  * extracts with full parallelism; the format is not splittable, which
  * is why extracted TEXT (parquet) is what flows into q97–q99, and PDF
  * stays an edge connector.
  */
object Pdf {

  /** Extract text from PDF payload rows → (path, doc_format, n_pages,
    * text, error). `text` is pages joined by "\n", page text is show
    * operators joined per the Td/TD/T*-newline rule. */
  def fromBinary(
      binary: DataFrame,
      pathCol: String = "path",
      payloadCol: String = "content"): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        extractText(bytes) match {
          case Right((nPages, text)) => (path, "pdf", nPages.toLong, text, null: String)
          case Left(err)             => (path, "pdf", 0L, null: String, err)
        }
      }
      .toDF(pathCol, "doc_format", "n_pages", "text", "error")
  }

  // ---- byte-level parser (runs inside executor tasks) ----

  private final case class PdfObj(num: Int, dict: String, streamData: Option[Array[Byte]])

  /** → Right((nPages, text)) or Left(error). */
  private[graft] def extractText(bytes: Array[Byte]): Either[String, (Int, String)] = {
    // ISO-8859-1 maps byte i to char i bijectively, so regex/string
    // search runs over the raw bytes without corruption.
    val raw = new String(bytes, "ISO-8859-1")
    if (!raw.startsWith("%PDF")) return Left("not a PDF (missing %PDF header)")
    // conservative: /Encrypt ANYWHERE error-tags (a trailer-only check
    // needs xref parsing, which this scanner deliberately skips; a
    // false positive degrades to the reference's own missing-parser
    // behavior rather than emitting ciphertext as "text")
    if (raw.contains("/Encrypt")) return Left("encrypted PDF unsupported")
    val objs = scanObjects(bytes, raw)
    if (objs.isEmpty) return Left("no PDF objects found")
    val byNum = objs.map(o => o.num -> o).toMap
    val pages = pageOrder(objs, byNum)
    if (pages.isEmpty) return Left("no page tree")
    val texts = pages.map { page =>
      val contentRefs = refsOf(page.dict, "Contents")
      val data = contentRefs.flatMap(byNum.get).flatMap(decodedStream)
      val joined = new ByteArrayOutputStream()
      data.foreach(joined.write)
      pageText(new String(joined.toByteArray, "ISO-8859-1"))
    }
    val text = texts.mkString("\n")
    if (text.trim.isEmpty) Left("no text content (image-only PDF?)")
    else Right((pages.length, text))
  }

  /** Locate every `N G obj … endobj`, slicing stream payloads by
    * /Length when it is a direct number (exact even when the payload
    * contains `endobj` bytes), else by scanning for `endstream`. */
  private def scanObjects(bytes: Array[Byte], raw: String): Seq[PdfObj] = {
    val header = java.util.regex.Pattern.compile("""(\d+)\s+(\d+)\s+obj\b""")
    val m = header.matcher(raw)
    val out = mutable.ArrayBuffer.empty[PdfObj]
    var searchFrom = 0
    while (searchFrom < raw.length && m.find(searchFrom)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamKw = raw.indexOf("stream", bodyStart)
      val endobj = raw.indexOf("endobj", bodyStart)
      val hasStream = streamKw >= 0 && (endobj < 0 || streamKw < endobj)
      if (!hasStream) {
        val end = if (endobj >= 0) endobj else raw.length
        out += PdfObj(num, raw.substring(bodyStart, end), None)
        searchFrom = math.min(end + 6, raw.length)
      } else {
        val dict = raw.substring(bodyStart, streamKw)
        // payload starts after "stream" + EOL (CRLF or LF per spec)
        var ds = streamKw + "stream".length
        if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
        if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
        val len = """/Length\s+(\d+)(?!\s+\d+\s+R)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
        val de = len match {
          case Some(n) if ds + n <= raw.length => ds + n
          case _ =>
            val e = raw.indexOf("endstream", ds)
            if (e >= 0) e else raw.length
        }
        out += PdfObj(num, dict, Some(java.util.Arrays.copyOfRange(bytes, ds, de)))
        val after = raw.indexOf("endobj", de)
        searchFrom = if (after >= 0) after + 6 else raw.length
      }
    }
    out.toSeq
  }

  /** `/Key N G R` or `/Key [N G R …]` → referenced object numbers. */
  private def refsOf(dict: String, key: String): Seq[Int] = {
    val arr = (s"""/$key\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(dict).map(_.group(1))
    arr match {
      case Some(inner) => """(\d+)\s+\d+\s+R""".r.findAllMatchIn(inner).map(_.group(1).toInt).toSeq
      case None =>
        (s"""/$key\\s+(\\d+)\\s+\\d+\\s+R""").r.findFirstMatchIn(dict).map(_.group(1).toInt).toSeq
    }
  }

  private def typeOf(dict: String): Option[String] =
    """/Type\s*/(\w+)""".r.findFirstMatchIn(dict).map(_.group(1))

  /** Page objects in reading order: walk Catalog → /Pages → /Kids
    * (depth-first, nested Pages nodes flatten in place); fall back to
    * /Type /Page objects in object-number order when no catalog
    * resolves (damaged-file stance). */
  private def pageOrder(objs: Seq[PdfObj], byNum: Map[Int, PdfObj]): Seq[PdfObj] = {
    def walk(num: Int, seen: Set[Int]): Seq[PdfObj] =
      if (seen(num)) Seq.empty // cycle guard: malformed Kids loops terminate
      else byNum.get(num).toSeq.flatMap { o =>
        typeOf(o.dict) match {
          case Some("Page")  => Seq(o)
          case Some("Pages") => refsOf(o.dict, "Kids").flatMap(walk(_, seen + num))
          case _             => Seq.empty
        }
      }
    val fromCatalog = for {
      cat <- objs.find(o => typeOf(o.dict).contains("Catalog"))
      root <- refsOf(cat.dict, "Pages").headOption
    } yield walk(root, Set.empty)
    fromCatalog.filter(_.nonEmpty).getOrElse(
      objs.filter(o => typeOf(o.dict).contains("Page")).sortBy(_.num))
  }

  /** Stream payload, inflated when /Filter names FlateDecode. */
  private def decodedStream(o: PdfObj): Option[Array[Byte]] = o.streamData.map { data =>
    if (o.dict.contains("/FlateDecode")) inflate(data) else data
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // corrupt tail: keep prefix
      }
      out.toByteArray
    } finally inf.end()
  }

  // ---- content-stream text operators ----

  /** Walk one page's content stream: literal/hex string operands feed
    * the show operators Tj / TJ / ' / "; Td, TD, T* and ' break lines.
    * Non-text operators and their operands are skipped untyped — a
    * text extractor only needs the string stack. */
  private[graft] def pageText(content: String): String = {
    val sb = new StringBuilder
    var pendingNewline = false
    // last string operand + array-of-strings operand (for TJ)
    var lastString: String = null
    var lastArray: List[String] = Nil
    var inArray = false
    var arrayAcc = List.empty[String]

    def emit(s: String): Unit = {
      if (pendingNewline && sb.nonEmpty) sb.append('\n')
      sb.append(s)
      pendingNewline = false
    }

    var i = 0
    val n = content.length
    while (i < n) {
      val ch = content.charAt(i)
      if (ch == '(') {
        val (s, next) = literalString(content, i)
        if (inArray) arrayAcc ::= s else lastString = s
        i = next
      } else if (ch == '<' && i + 1 < n && content.charAt(i + 1) != '<') {
        val (s, next) = hexString(content, i)
        if (inArray) arrayAcc ::= s else lastString = s
        i = next
      } else if (ch == '<') { i += 2 // dictionary open «<<» — skip
      } else if (ch == '[') { inArray = true; arrayAcc = Nil; i += 1
      } else if (ch == ']') { inArray = false; lastArray = arrayAcc.reverse; i += 1
      } else if (ch == '%') { // comment to EOL
        while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r') i += 1
      } else if (ch.isWhitespace || ch == '>' || ch == ')') { i += 1
      } else {
        val start = i
        while (i < n && !" \t\r\n\f()<>[]/%".contains(content.charAt(i))) i += 1
        val tok = content.substring(start, i)
        if (i == start) i += 1 // lone delimiter (e.g. '/'), consume
        tok match {
          case "Tj" => if (lastString != null) { emit(lastString); lastString = null }
          case "TJ" => if (lastArray.nonEmpty) { emit(lastArray.mkString); lastArray = Nil }
          case "'"  => pendingNewline = true
                       if (lastString != null) { emit(lastString); lastString = null }
          case "\"" => pendingNewline = true
                       if (lastString != null) { emit(lastString); lastString = null }
          case "Td" | "TD" | "T*" => pendingNewline = true
          case "BT" => lastString = null; lastArray = Nil
          case _    => () // positioning/graphics operators: irrelevant to text
        }
      }
    }
    sb.toString
  }

  /** PDF literal string starting at `(`: returns (decoded UTF-8 text,
    * index after the closing paren). Handles nested unescaped parens,
    * all escape forms, octal codes, and escaped-EOL continuation. */
  private[graft] def literalString(s: String, open: Int): (String, Int) = {
    val bytes = new ByteArrayOutputStream()
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1 // continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            bytes.write(v & 0xFF)
          case other => bytes.write(other.toInt & 0xFF); i += 2 // \( \) \\ and unknown → literal
        }
      } else if (c == '(') { depth += 1; bytes.write(c.toInt); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) bytes.write(c.toInt); i += 1 }
      else { bytes.write(c.toInt & 0xFF); i += 1 }
    }
    (new String(bytes.toByteArray, "UTF-8"), i)
  }

  /** PDF hex string `<48656C6C6F>` → (decoded UTF-8 text, index after
    * `>`); an odd trailing digit pads with 0 per spec. */
  private[graft] def hexString(s: String, open: Int): (String, Int) = {
    var i = open + 1
    val digits = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) digits.append(c)
      i += 1
    }
    if (digits.length % 2 == 1) digits.append('0')
    val bytes = digits.toString.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    (new String(bytes, "UTF-8"), i + 1)
  }
}
