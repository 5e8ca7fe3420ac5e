package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Helpers

/** Deterministic utility helpers (ref utils/helpers.py:21-260),
  * pinned to the reference's documented examples. */
class HelpersSpec extends AnyFunSuite {

  test("parseSize handles units, decimals, whitespace; rejects junk") {
    assert(Helpers.parseSize("1GB") == 1073741824L)
    assert(Helpers.parseSize("512MB") == 536870912L)
    assert(Helpers.parseSize("1024KB") == 1048576L)
    assert(Helpers.parseSize("1.5 kb") == 1536L)
    assert(Helpers.parseSize("10B") == 10L)
    assert(Helpers.parseSize("2TB") == 2L * 1024 * 1024 * 1024 * 1024)
    intercept[IllegalArgumentException](Helpers.parseSize("10"))
    intercept[IllegalArgumentException](Helpers.parseSize("ten MB"))
    intercept[IllegalArgumentException](Helpers.parseSize("10XB"))
  }

  test("formatSize round-trips the reference examples") {
    assert(Helpers.formatSize(1073741824L) == "1.00 GB")
    assert(Helpers.formatSize(536870912L) == "512.00 MB")
    assert(Helpers.formatSize(512L) == "512.00 B")
    assert(Helpers.formatSize(5L * 1024 * 1024 * 1024 * 1024 * 1024) == "5.00 PB")
  }

  test("parseDuration: singular/plural units, case, whitespace") {
    assert(Helpers.parseDuration("1 hour").toHours == 1)
    assert(Helpers.parseDuration("30 minutes").toMinutes == 30)
    assert(Helpers.parseDuration("2 days").toDays == 2)
    assert(Helpers.parseDuration("1 week").toDays == 7)
    assert(Helpers.parseDuration("90 Seconds ").getSeconds == 90)
    intercept[IllegalArgumentException](Helpers.parseDuration("soon"))
    intercept[IllegalArgumentException](Helpers.parseDuration("5 fortnights"))
  }

  test("chunkIterable splits with a short tail") {
    assert(Helpers.chunkIterable(Seq(1, 2, 3, 4, 5), 2).toSeq ==
      Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
    assert(Helpers.chunkIterable(Seq.empty[Int], 3).toSeq.isEmpty)
    intercept[IllegalArgumentException](Helpers.chunkIterable(Seq(1), 0))
  }

  test("flattenMap/unflattenMap round-trip nested option maps") {
    val nested = Map[String, Any]("a" -> Map("b" -> 1, "c" -> Map("d" -> 2)), "e" -> 3)
    val flat = Helpers.flattenMap(nested)
    assert(flat == Map("a.b" -> 1, "a.c.d" -> 2, "e" -> 3))
    assert(Helpers.unflattenMap(flat) == nested)
    // custom separator
    assert(Helpers.flattenMap(Map("a" -> Map("b" -> 1)), sep = "__") == Map("a__b" -> 1))
  }

  test("safeGet walks nested maps with a miss default") {
    val d = Map[String, Any]("a" -> Map("b" -> 1))
    assert(Helpers.safeGet(d, "a", "b").contains(1))
    assert(Helpers.safeGet(d, "a", "z").isEmpty)
    assert(Helpers.safeGet(d, "x", "b").isEmpty)
  }

  test("mergeMaps deep-merges with later precedence") {
    val merged = Helpers.mergeMaps(
      Map("a" -> Map("x" -> 1, "y" -> 2), "b" -> 1),
      Map("a" -> Map("y" -> 20, "z" -> 30), "c" -> 3))
    assert(merged == Map("a" -> Map("x" -> 1, "y" -> 20, "z" -> 30), "b" -> 1, "c" -> 3))
    // scalar overrides map wholesale, like the reference
    assert(Helpers.mergeMaps(Map("a" -> Map("x" -> 1)), Map("a" -> 5)) == Map("a" -> 5))
  }

  test("sanitizeColumnName: specials, collapsing, digit prefix, case") {
    assert(Helpers.sanitizeColumnName("  Order Total ($)  ") == "order_total")
    assert(Helpers.sanitizeColumnName("a--b..c") == "a_b_c")
    assert(Helpers.sanitizeColumnName("123col") == "col_123col")
    assert(Helpers.sanitizeColumnName("__x__") == "x")
  }

  test("inferMimeType covers the connector formats; unknown falls back") {
    assert(Helpers.inferMimeType("data/x.parquet") == "application/parquet")
    assert(Helpers.inferMimeType("a/B.CSV".toLowerCase) == "text/csv")
    assert(Helpers.inferMimeType("clip.mp4") == "video/mp4")
    assert(Helpers.inferMimeType("doc.docx") ==
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
    assert(Helpers.inferMimeType("mystery.bin") == "application/octet-stream")
    assert(Helpers.inferMimeType("no_extension") == "application/octet-stream")
  }

  test("datetime helpers: the utils.py:9-55 rules — naive is UTC, aware converts, ISO shapes round-trip") {
    import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}
    // ensure_utc: naive assumed UTC; aware converted to the same instant
    val naive = LocalDateTime.parse("2024-01-02T03:04:05")
    assert(Helpers.ensureUtc(naive) == OffsetDateTime.parse("2024-01-02T03:04:05Z"))
    val plus5 = OffsetDateTime.parse("2024-01-02T03:04:05+05:00")
    assert(Helpers.ensureUtc(plus5) == OffsetDateTime.parse("2024-01-01T22:04:05Z"))
    // parse_iso: Z suffix, numeric offset, naive, bare date (midnight UTC)
    assert(Helpers.parseIso("2024-01-02T03:04:05Z") ==
      OffsetDateTime.parse("2024-01-02T03:04:05Z"))
    assert(Helpers.parseIso("2024-01-02T03:04:05+05:00") ==
      OffsetDateTime.parse("2024-01-01T22:04:05Z"))
    assert(Helpers.parseIso("2024-01-02T03:04:05") ==
      OffsetDateTime.parse("2024-01-02T03:04:05Z"))
    assert(Helpers.parseIso("2024-01-02") ==
      OffsetDateTime.parse("2024-01-02T00:00:00Z"))
    // format_iso: the Python isoformat shape — +00:00 never Z, seconds
    // always, fractional part only when non-zero (microsecond grid)
    assert(Helpers.formatIso(OffsetDateTime.parse("2024-01-02T03:04:05Z")) ==
      "2024-01-02T03:04:05+00:00")
    assert(Helpers.formatIso(OffsetDateTime.parse("2024-01-02T03:04:00Z")) ==
      "2024-01-02T03:04:00+00:00")
    assert(Helpers.formatIso(OffsetDateTime.parse("2024-01-02T03:04:05.123456Z")) ==
      "2024-01-02T03:04:05.123456+00:00")
    assert(Helpers.formatIso(plus5) == "2024-01-01T22:04:05+00:00")
    // round-trip: parse(format(x)) == ensureUtc(x)
    assert(Helpers.parseIso(Helpers.formatIso(plus5)) == Helpers.ensureUtc(plus5))
    // utc_now is aware at UTC
    assert(Helpers.utcNow().getOffset == ZoneOffset.UTC)
  }

  test("typed error vocabulary: hierarchy, fields, and the details rendering shape") {
    import graft.ops.Errors
    // every failure class is catchable as the base
    val all: Seq[Errors.GraftError] = Seq(
      Errors.ConfigurationError("bad config"),
      Errors.ConnectionError("refused", connectorType = Some("postgresql")),
      Errors.ExtractionError("pull failed", source = Some("orders")),
      Errors.TransformationError("cast failed", transformation = Some("clean")),
      Errors.LoadError("write failed", target = Some("warehouse.t")),
      Errors.StorageError("put failed", provider = Some("s3"), operation = Some("upload")),
      Errors.VersionedTableError("commit failed", table = Some("dim"), operation = Some("merge")),
      Errors.LlmError("timeout", provider = Some("x"), model = Some("y")),
      Errors.DataQualityError("nulls", checkName = Some("not_null"), failedRecords = Some(3L)),
      Errors.SchemaError("drift", expectedSchema = Some("a:int"), actualSchema = Some("a:string")),
      Errors.WatermarkError("regressed", watermarkColumn = Some("updated_at")),
      Errors.RetryExhaustedError(3, new RuntimeException("boom")))
    all.foreach(e => assert(e.isInstanceOf[RuntimeException]))
    // the reference __str__ shape: bare message without details,
    // "msg | Details: {k=v, ...}" (key-sorted) with them
    assert(Errors.ConfigurationError("bad config").getMessage == "bad config")
    assert(Errors.ConfigurationError("bad config",
      details = Map("key" -> "x", "file" -> "s.yml")).getMessage ==
      "bad config | Details: {file=s.yml, key=x}")
    // typed fields survive the catch
    val caught = intercept[Errors.GraftError] {
      throw Errors.ConnectionError("refused", connectorType = Some("mysql"))
    }
    caught match {
      case Errors.ConnectionError(_, ct, _, _) => assert(ct.contains("mysql"))
      case other => fail(s"wrong class: $other")
    }
    // Retry participates: exhaustion is a GraftError, alias intact
    val exhausted = intercept[Errors.GraftError] {
      graft.ops.Retry.withBackoff(maxAttempts = 2, sleep = _ => (),
        jitter = () => 0.0)(() => throw new RuntimeException("down"))
    }
    assert(exhausted.isInstanceOf[graft.ops.Retry.RetryExhausted])
    assert(exhausted.getMessage == "retry exhausted after 2 attempts: down")
    // cause chain: the last error rides as the cause
    assert(exhausted.getCause.getMessage == "down")
  }
}
