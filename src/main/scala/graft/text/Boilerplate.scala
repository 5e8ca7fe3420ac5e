package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Block-level boilerplate removal — the "web page → main content"
  * step between crawl ingestion ([[graft.sources.Warc]]) and the text
  * hygiene fleet (q97/q117/q118/q135). The reference's HTML path stops
  * at whole-page tag stripping (documents.py:215, re-expressed in
  * [[graft.multimodal.DocumentExtract.extractHtml]]) — which keeps
  * nav bars, link farms, and footers glued to the article text. This
  * is the published remedy in its simplest deterministic form: segment
  * the page into BLOCKS at block-level tag boundaries, classify each
  * block by length + link density + stopword density (the
  * Boilerpipe/jusText feature family — Kohlschütter et al., WSDM 2010;
  * Pomikálek 2011), keep the content blocks.
  *
  * Everything is a pure `Column` expression over higher-order array
  * functions — no UDF, no explode, no shuffle: one narrow projection
  * per page, which is what lets a 100 TB crawl pay exactly one scan
  * for extraction (golden-plan-pinned; the q117/q118 shape). The rule
  * is intentionally a deterministic replayable function of the page
  * bytes so the DuckDB oracle can re-derive it expression-for-
  * expression (q148's full hash gate).
  *
  * Classification rule (per block, defaults tuned on the planted
  * fixtures in TextSpec): CONTENT ⇔ text length ≥ `minLen` AND
  * link-chars/chars ≤ `maxLinkDensity` AND stopwords/tokens ≥
  * `minStopRatio`. Everything else — short tag clouds, sponsored
  * link rows, nav/footer chrome — is boilerplate.
  */
object Boilerplate {

  /** Block-level tag boundary (opening or closing, attributes
    * allowed): the HTML5 flow-content splitters plus `<br>`. RE2-safe
    * (no backreferences) so the same pattern drives the DuckDB oracle. */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "blockquote|pre|section|article|header|footer|nav|aside|main|form|" +
      "figure|figcaption|br)(?:\\s[^>]*)?/?>"

  /** Anchor elements with their inner text (group 1) — the link-char
    * numerator of the density feature. */
  val AnchorPattern: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** English stopword profile reused from the language-ID heuristic
    * ([[TextAnalysis.Stopwords]]) — the density feature needs only
    * high-frequency function words. */
  val StopwordsEn: Seq[String] =
    TextAnalysis.Stopwords.collectFirst { case ("en", ws) => ws }.get

  /** Inline-tag strip + whitespace collapse: the per-block text. */
  private def blockText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]+>", " "), "\\s+", " "))

  /** Per-block stats over raw HTML:
    * array<struct<text, len, link_len, stop_ratio, content>> —
    * one entry per non-empty block, in page order. */
  def blockStats(
      html: Column,
      minLen: Int = 40,
      maxLinkDensity: Double = 0.25,
      minStopRatio: Double = 0.05): Column = {
    // Higher-order lambdas are interpreted with NO common-subexpression
    // elimination: every reference to a named subtree re-evaluates it,
    // so the old flat form ran blockText (two regex passes) ~10× and
    // the tokenizer ~6× per block through the text/len/ratio/content
    // references. The `transform(array(x), v => …)` nesting (the
    // LangId.scala trick) materializes each stage ONCE and later
    // references are cheap field reads on the bound row: blockText,
    // the anchor-strip aggregate, the tokenizer and the stopword scan
    // each run exactly once per block (r19; same algebra, same values).
    val stats = transform(split(html, BlockTagPattern), b =>
      element_at(transform(array(struct(
          blockText(b).as("text"),
          aggregate(
            transform(regexp_extract_all(b, lit(AnchorPattern), lit(1)),
              a => length(blockText(a)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("link_len"))), p =>
        element_at(transform(array(struct(
            p.getField("text").as("text"),
            length(p.getField("text")).cast("long").as("len"),
            p.getField("link_len").as("link_len"),
            TextAnalysis.tokens(p.getField("text")).as("toks"))), q =>
          element_at(transform(array(struct(
              size(q.getField("toks")).as("ntok"),
              size(filter(q.getField("toks"),
                t => t.isin(StopwordsEn.map(lit): _*))).as("stops"))), r => {
            val text = q.getField("text")
            val len = q.getField("len")
            val linkLen = q.getField("link_len")
            val nTok = r.getField("ntok")
            val stops = r.getField("stops")
            val stopRatio =
              when(nTok > 0, stops.cast("double") / nTok.cast("double")).otherwise(lit(0.0))
            val linkDensity =
              when(len > 0, linkLen.cast("double") / len.cast("double")).otherwise(lit(1.0))
            struct(
              text.as("text"), len.as("len"), linkLen.as("link_len"),
              stopRatio.as("stop_ratio"),
              (len >= minLen && linkDensity <= maxLinkDensity &&
                stopRatio >= minStopRatio).as("content"))
          }), 1)), 1)), 1))
    filter(stats, s => s.getField("len") > 0)
  }

  /** Main text of a page: its content blocks joined in page order. */
  def mainText(
      html: Column,
      minLen: Int = 40,
      maxLinkDensity: Double = 0.25,
      minStopRatio: Double = 0.05): Column = {
    val content =
      filter(blockStats(html, minLen, maxLinkDensity, minStopRatio), s => s.getField("content"))
    array_join(transform(content, s => s.getField("text")), " ")
  }
}
