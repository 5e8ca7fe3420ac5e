package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDX(J) index parsing — the lookup sidecar Common Crawl publishes
  * beside every WARC segment (the `cc-index` CDXJ format, one line
  * per captured record): `<SURT key> <14-digit timestamp> <JSON>`
  * where the JSON carries the record's url, mime, HTTP status, SHA-1
  * digest, and — the part that matters for reading — the owning WARC
  * `filename` plus the record's byte `offset` and `length` (each
  * record its own gzip member, so the (offset, length) slice is a
  * complete record). Parsed rows feed
  * [[graft.sources.Warc.responsesIndexed]]'s positioned reads.
  *
  * Pure column algebra: the line splits on the FIRST two spaces by
  * regex (the JSON tail contains spaces, so a plain split cannot be
  * bounded portably) and the JSON fields extract with
  * `get_json_object` — both replayable in an external oracle
  * (DuckDB's regexp_extract + json_extract_string). A line whose
  * head does not match the three-part grammar yields null fields
  * behind the stable schema (the malformed-input contract is
  * spec-tested; oracles replay the happy path).
  */
object Cdx {

  private val LineRx = "^(\\S+) (\\S+) (.*)$"

  /** CDXJ lines → (surt, ts, url, status, mime, digest, warc_path,
    * offset, length). Numeric fields are strings in the wire format
    * (CDXJ quotes everything); they cast here, null on absence or
    * non-numeric garbage. */
  def parse(lines: DataFrame, lineCol: String): DataFrame = {
    val l = trim(col(lineCol))
    def part(i: Int): Column = {
      val p = regexp_extract(l, LineRx, i)
      when(p =!= "", p)
    }
    def js(json: Column, field: String): Column =
      get_json_object(json, s"$$.$field")
    lines
      .select(part(1).as("surt"), part(2).as("ts"), part(3).as("_json"))
      .select(col("surt"), col("ts"),
        js(col("_json"), "url").as("url"),
        js(col("_json"), "status").cast("int").as("status"),
        js(col("_json"), "mime").as("mime"),
        js(col("_json"), "digest").as("digest"),
        js(col("_json"), "filename").as("warc_path"),
        js(col("_json"), "offset").cast("long").as("offset"),
        js(col("_json"), "length").cast("long").as("length"))
  }
}
