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
}
