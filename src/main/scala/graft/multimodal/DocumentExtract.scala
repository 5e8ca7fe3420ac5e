package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unstructured-document text extraction (ref
  * connectors/unstructured/documents.py:32-248).
  *
  * The reference shells out to BeautifulSoup/unstructured when
  * installed and falls back to regex stripping when not
  * (documents.py:230-233); none of those libraries exist here, so the
  * DETERMINISTIC extractors — HTML, markdown, plain text — are
  * implemented fully as codegen'd column expressions (no UDFs: every
  * regexp_replace below runs inside whole-stage codegen, scales
  * per-row, and shuffles nothing). Binary formats route to their real
  * first-principles parsers — XLSX → [[graft.sources.Excel]], DOCX/
  * PPTX → [[Office]], PDF → [[Pdf]] (zip, XML, Inflater are all
  * JVM-native) — and this extractor error-tags them with the routing
  * hint behind the identical output schema, so a caller that lands
  * everything through one entry point loses nothing.
  *
  * Output feeds straight into [[graft.text.TextAnalysis]] (language id,
  * quality metrics, fingerprints — q97–q99 run unchanged over
  * extracted text; proven in ComponentSpec).
  */
object DocumentExtract {

  /** documents.py:35 SUPPORTED_EXTENSIONS. */
  val FormatOf: Map[String, String] = Map(
    "docx" -> "word", "doc" -> "word",
    "pptx" -> "powerpoint", "ppt" -> "powerpoint",
    "xlsx" -> "excel", "xls" -> "excel",
    "txt" -> "text", "md" -> "markdown",
    "html" -> "html", "htm" -> "html", "pdf" -> "pdf")

  /** Lowercased extension → document format; "unknown" otherwise. */
  def detectFormat(path: Column): Column = {
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    FormatOf.foldLeft(lit("unknown")) { case (acc, (e, f)) =>
      when(ext === e, f).otherwise(acc)
    }
  }

  private def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** documents.py:215 `_extract_html` (regex fallback path, made
    * complete): drop script/style subtrees and comments FIRST — their
    * content is not document text — then strip tags, decode the common
    * entities, collapse whitespace. */
  def extractHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val entities = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
    val decoded = entities.foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(ent), ch)
    }
    collapseWs(decoded)
  }

  /** `<title>` text, "" when absent (documents.py:227). */
  def htmlTitle(html: Column): Column =
    collapseWs(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** Hyperlinks out of an HTML page → array<struct<href, anchor>>,
    * document order — the edge-extraction step between the crawl
    * front door (q147/q148) and the webgraph family (q151–q161):
    * every published webgraph is this column applied to a dump.
    * Quoted `href` attributes only (the grammar a crawler's OWN
    * renderer emits; unquoted legacy attrs are a parse seam, the
    * [[extractHtml]] stance); anchors are tag-stripped and
    * whitespace-collapsed, anchor-less links keep an empty string.
    * Pure regex column algebra — no UDF, replayable in SQL. */
  def htmlLinks(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0)),
      t => struct(
        regexp_extract(t, "(?is)href\\s*=\\s*[\"']([^\"']*)[\"']", 1).as("href"),
        collapseWs(regexp_replace(
          regexp_extract(t, "(?is)>(.*)</a>", 1), "<[^>]+>", " ")).as("anchor")))

  /** Markdown → plain text: fenced code kept as content but markers
    * dropped, images reduce to alt text, links to their text, heading/
    * emphasis/list/quote markers stripped. Deterministic and total —
    * any input degrades to itself minus markers. */
  def extractMarkdown(md: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      c => regexp_replace(c, "(?m)^```[^\\n]*$", " "), // fence lines
      c => regexp_replace(c, "`([^`]*)`", "$1"), // inline code
      c => regexp_replace(c, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1"), // images → alt
      c => regexp_replace(c, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"), // links → text
      c => regexp_replace(c, "(?m)^#{1,6}\\s*", ""), // headings
      c => regexp_replace(c, "(?m)^\\s*(?:[-*+]|\\d+\\.)\\s+", ""), // list bullets
      c => regexp_replace(c, "(?m)^>\\s?", ""), // blockquotes
      c => regexp_replace(c, "(\\*{1,3}|_{1,3})(\\S(?:.*?\\S)?)\\1", "$2")) // emphasis
    collapseWs(steps.foldLeft(md)((c, f) => f(c)))
  }

  /** Extract text from binary document payloads by format →
    * (…, doc_format, title, text, line_count, error). Text formats
    * decode fully; office formats error-tag (parser libraries absent —
    * same contract as documents.py:245 when unstructured is missing). */
  def extractDocuments(df: DataFrame, pathCol: String, payloadCol: String): DataFrame = {
    val raw = decode(col(payloadCol), "UTF-8")
    val fmt = detectFormat(col(pathCol))
    val text = when(fmt === "html", extractHtml(raw))
      .when(fmt === "markdown", extractMarkdown(raw))
      .when(fmt === "text", raw)
    df.withColumn("doc_format", fmt)
      .withColumn("title", when(fmt === "html", htmlTitle(raw)).otherwise(lit(null).cast("string")))
      .withColumn("text", text)
      .withColumn("line_count",
        when(text.isNotNull, size(split(text, "\n")).cast("long"))) // documents.py:210
      .withColumn("error",
        when(fmt === "excel", lit("spreadsheets route through graft.sources.Excel"))
          .when(fmt === "pdf", lit("PDFs route through graft.multimodal.Pdf"))
          .when(fmt.isin("word", "powerpoint"),
            lit("office documents route through graft.multimodal.Office"))
          .when(fmt === "unknown", lit("unsupported extension")))
  }
}
