package graft.ops

import java.time.Duration

/** General-purpose deterministic utilities (ref utils/helpers.py:21-260)
  * — the size/duration parsers config surfaces lean on, nested-map
  * plumbing for semi-structured options, and the identifier/MIME
  * helpers connectors share. Pure Scala, no Spark: these run on the
  * driver while parsing configs, long before a plan exists.
  * (helpers.py's `flatten_dict` has a row-scale sibling already:
  * [[graft.medallion.Silver.flattenStructs]] flattens nested STRUCT
  * columns inside the plan; this one flattens driver-side option
  * maps.)
  */
object Helpers {

  private val SizeUnits = Map(
    "B" -> 1L, "KB" -> 1024L, "MB" -> 1024L * 1024, "GB" -> 1024L * 1024 * 1024,
    "TB" -> 1024L * 1024 * 1024 * 1024)

  /** helpers.py:21 `parse_size`: "512MB" → bytes. */
  def parseSize(s: String): Long = {
    val m = "^(\\d+(?:\\.\\d+)?)\\s*([A-Z]{1,2})$".r
      .findFirstMatchIn(s.toUpperCase.trim)
      .getOrElse(throw new IllegalArgumentException(s"Invalid size format: $s"))
    val unit = SizeUnits.getOrElse(m.group(2),
      throw new IllegalArgumentException(s"Unknown unit: ${m.group(2)}"))
    (m.group(1).toDouble * unit).toLong
  }

  /** helpers.py:53 `format_size`: bytes → "1.00 GB". */
  def formatSize(bytes: Long): String = {
    var v = bytes.toDouble
    for (unit <- Seq("B", "KB", "MB", "GB", "TB")) {
      if (math.abs(v) < 1024.0) return f"$v%.2f $unit"
      v /= 1024.0
    }
    f"$v%.2f PB"
  }

  /** helpers.py:68 `parse_duration`: "30 minutes" → Duration. */
  def parseDuration(s: String): Duration = {
    val m = "^(\\d+)\\s*(second|minute|hour|day|week)s?$".r
      .findFirstMatchIn(s.toLowerCase.trim)
      .getOrElse(throw new IllegalArgumentException(s"Invalid duration format: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "second" => Duration.ofSeconds(n)
      case "minute" => Duration.ofMinutes(n)
      case "hour"   => Duration.ofHours(n)
      case "day"    => Duration.ofDays(n)
      case "week"   => Duration.ofDays(7 * n)
    }
  }

  /** helpers.py:97 `chunk_iterable` (Scala's grouped, pinned for API
    * parity). */
  def chunkIterable[A](items: Iterable[A], chunkSize: Int): Iterator[Seq[A]] = {
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    items.iterator.grouped(chunkSize).map(_.toSeq)
  }

  /** helpers.py:117 `flatten_dict`: {"a": {"b": 1}} → {"a.b": 1}. */
  def flattenMap(m: Map[String, Any], parentKey: String = "", sep: String = "."): Map[String, Any] =
    m.flatMap {
      case (k, v: Map[_, _]) =>
        flattenMap(v.asInstanceOf[Map[String, Any]],
          if (parentKey.isEmpty) k else s"$parentKey$sep$k", sep)
      case (k, v) =>
        Map((if (parentKey.isEmpty) k else s"$parentKey$sep$k") -> v)
    }

  /** helpers.py:138 `unflatten_dict`: {"a.b": 1} → {"a": {"b": 1}}.
    * Later keys win on conflict, matching the reference's mutation
    * order. */
  def unflattenMap(m: Map[String, Any], sep: String = "."): Map[String, Any] =
    m.foldLeft(Map.empty[String, Any]) { case (acc, (key, value)) =>
      def insert(curr: Map[String, Any], parts: List[String]): Map[String, Any] = parts match {
        case last :: Nil => curr + (last -> value)
        case head :: rest =>
          val child = curr.get(head) match {
            case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
          curr + (head -> insert(child, rest))
        case Nil => curr
      }
      insert(acc, key.split(java.util.regex.Pattern.quote(sep)).toList)
    }

  /** helpers.py:157 `safe_get`: nested lookup with default. */
  def safeGet(m: Map[String, Any], keys: String*): Option[Any] =
    keys.foldLeft(Option[Any](m)) {
      case (Some(curr: Map[_, _]), k) => curr.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  /** helpers.py:174 `merge_dicts`: deep merge, later maps win. */
  def mergeMaps(maps: Map[String, Any]*): Map[String, Any] =
    maps.foldLeft(Map.empty[String, Any]) { (acc, m) =>
      m.foldLeft(acc) { case (r, (k, v)) =>
        (r.get(k), v) match {
          case (Some(a: Map[_, _]), b: Map[_, _]) =>
            r + (k -> mergeMaps(a.asInstanceOf[Map[String, Any]], b.asInstanceOf[Map[String, Any]]))
          case _ => r + (k -> v)
        }
      }
    }

  /** helpers.py:194 `sanitize_column_name` — lowercase, specials → _,
    * collapse/trim underscores, digit-leading names get col_. */
  def sanitizeColumnName(name: String): String = {
    var s = name.trim
    s = s.replaceAll("[^\\w]", "_")
    s = s.replaceAll("_+", "_")
    s = s.replaceAll("^_+|_+$", "")
    if (s.nonEmpty && s.head.isDigit) s = s"col_$s"
    s.toLowerCase
  }

  /** helpers.py:214 `infer_mime_type` (the table the reference keeps;
    * unknown extensions → application/octet-stream). */
  def inferMimeType(path: String): String = {
    val ext = path.lastIndexOf('.') match {
      case -1 => ""
      case i => path.substring(i).toLowerCase
    }
    MimeTypes.getOrElse(ext, "application/octet-stream")
  }

  // --- core/utils.py:9-55 datetime helpers -------------------------------
  // The reference pins four tiny timezone rules its connectors and
  // watermark plumbing rely on; java.time expresses the same semantics,
  // mirrored here under the reference's names so a user migrating code
  // finds them. All values are OffsetDateTime at UTC — the JVM's
  // "timezone-aware datetime".

  /** utils.py:9 `utc_now`: current UTC time, timezone-aware. */
  def utcNow(): java.time.OffsetDateTime =
    java.time.OffsetDateTime.now(java.time.Clock.systemUTC())

  /** utils.py:22 `ensure_utc` for an aware value: convert to UTC,
    * same instant. */
  def ensureUtc(dt: java.time.OffsetDateTime): java.time.OffsetDateTime =
    dt.withOffsetSameInstant(java.time.ZoneOffset.UTC)

  /** utils.py:22 `ensure_utc` for a naive value: ASSUME UTC (the
    * reference's documented rule — a naive timestamp is taken as UTC,
    * never local time). */
  def ensureUtc(dt: java.time.LocalDateTime): java.time.OffsetDateTime =
    dt.atOffset(java.time.ZoneOffset.UTC)

  /** utils.py:40 `format_iso`: ISO 8601 with the reference's exact
    * rendering — seconds always present, fractional part only when
    * non-zero (microsecond precision), UTC offset as `+00:00` (the
    * Python `isoformat` shape, not java.time's `Z`). */
  def formatIso(dt: java.time.OffsetDateTime): String = {
    val u = ensureUtc(dt)
    val base = u.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val frac = if (u.getNano != 0) f".${u.getNano / 1000}%06d" else ""
    base + frac + "+00:00"
  }

  /** utils.py:40 `format_iso()` with no argument: now. */
  def formatIso(): String = formatIso(utcNow())

  /** utils.py:55 `parse_iso`: accepts `Z` or numeric offsets (aware →
    * converted to UTC), naive datetimes (assumed UTC), and bare dates
    * (midnight UTC) — the shapes Python's `fromisoformat` plus the
    * reference's `Z` replacement accept. */
  def parseIso(s: String): java.time.OffsetDateTime = {
    val norm = s.trim.replace("Z", "+00:00")
    try ensureUtc(java.time.OffsetDateTime.parse(norm))
    catch {
      case _: java.time.format.DateTimeParseException =>
        try ensureUtc(java.time.LocalDateTime.parse(norm))
        catch {
          case _: java.time.format.DateTimeParseException =>
            ensureUtc(java.time.LocalDate.parse(norm).atStartOfDay())
        }
    }
  }

  private val MimeTypes = Map(
    ".csv" -> "text/csv",
    ".json" -> "application/json",
    ".jsonl" -> "application/jsonlines",
    ".parquet" -> "application/parquet",
    ".avro" -> "application/avro",
    ".orc" -> "application/orc",
    ".xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".xls" -> "application/vnd.ms-excel",
    ".pdf" -> "application/pdf",
    ".txt" -> "text/plain",
    ".xml" -> "application/xml",
    ".html" -> "text/html",
    ".png" -> "image/png",
    ".jpg" -> "image/jpeg",
    ".jpeg" -> "image/jpeg",
    ".gif" -> "image/gif",
    ".docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".doc" -> "application/msword",
    ".pptx" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".mp3" -> "audio/mpeg",
    ".mp4" -> "video/mp4",
    ".wav" -> "audio/wav")
}
