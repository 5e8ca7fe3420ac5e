package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  * bounded portably) and the JSON extracts with ONE `from_json` into
  * a struct — one parse per row where a `get_json_object` per field
  * would re-parse the JSON nine times (measured at half the indexed
  * read's wall before the change) — replayable in an external oracle
  * (DuckDB's regexp_extract + json_extract_string; identical values,
  * the oracle pays its own parse count). A line whose head does not
  * match the three-part grammar, or whose tail is not JSON, yields
  * null fields behind the stable schema (the malformed-input
  * contract is spec-tested; oracles replay the happy path).
  */
object Cdx {

  private val LineRx = "^(\\S+) (\\S+) (.*)$"

  /** The CDXJ JSON payload schema — everything a string on the wire
    * (CDXJ quotes numerics); casts happen after the single parse. */
  private val JsonSchema = StructType(
    Seq("url", "mime", "status", "digest", "filename", "offset", "length")
      .map(StructField(_, StringType, nullable = true)))

  /** CDXJ lines → (surt, ts, url, status, mime, digest, warc_path,
    * offset, length). Numeric fields cast here, null on absence or
    * non-numeric garbage. */
  def parse(lines: DataFrame, lineCol: String): DataFrame = {
    val l = trim(col(lineCol))
    def part(i: Int): Column = {
      val p = regexp_extract(l, LineRx, i)
      when(p =!= "", p)
    }
    lines
      .select(part(1).as("surt"), part(2).as("ts"),
        from_json(part(3), JsonSchema).as("_j"))
      .select(col("surt"), col("ts"),
        col("_j.url").as("url"),
        col("_j.status").cast("int").as("status"),
        col("_j.mime").as("mime"),
        col("_j.digest").as("digest"),
        col("_j.filename").as("warc_path"),
        col("_j.offset").cast("long").as("offset"),
        col("_j.length").cast("long").as("length"))
  }
}
