package graft

import org.apache.spark.sql.types._

import graft.sources.Rest
import graft.sources.Rest._

/** REST connector surface without a network: auth headers, pagination
  * state machines over fixture responses, rate spacing, webhook
  * signatures, page landing into typed DataFrames.
  */
class RestSpec extends SparkSpec {

  test("auth header construction: api key, bearer, basic") {
    assert(buildHeaders(ApiKey("k1"))("X-API-Key") == "k1")
    assert(buildHeaders(ApiKey("k2", "X-Custom"))("X-Custom") == "k2")
    assert(buildHeaders(Bearer("tok"))("Authorization") == "Bearer tok")
    // RFC 7617 test vector: Aladdin:open sesame
    assert(buildHeaders(Basic("Aladdin", "open sesame"))("Authorization") ==
      "Basic QWxhZGRpbjpvcGVuIHNlc2FtZQ==")
    val merged = buildHeaders(NoAuth, Map("X-Trace" -> "1"))
    assert(merged("Content-Type") == "application/json" && merged("X-Trace") == "1")
  }

  test("rate limit spacing") {
    assert(minIntervalMs(60) == 1000L)
    assert(minIntervalMs(90) == 667L) // ceil
    intercept[IllegalArgumentException](minIntervalMs(0))
  }

  private def page(items: Range, extra: String = ""): String =
    s"""{"data":[${items.map(i => s"""{"id":$i,"name":"r$i"}""").mkString(",")}]$extra}"""

  test("offset pagination stops on a short page; params advance correctly") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val fetch = (_: String, params: Map[String, String]) => {
      calls += params
      params("offset").toInt match {
        case 0 => page(0 until 3)
        case 3 => page(3 until 5) // short page → stop
        case o => fail(s"unexpected offset $o")
      }
    }
    val pages = extractPages(fetch, "/things", OffsetPagination(pageSize = 3))
    assert(pages.size == 2)
    assert(calls.map(_("offset")).toSeq == Seq("0", "3"))
  }

  test("cursor pagination follows next_cursor until absent") {
    val fetch = (_: String, params: Map[String, String]) =>
      params.get("cursor") match {
        case None        => page(0 until 2, ""","next_cursor":"c1"""")
        case Some("c1")  => page(2 until 4, ""","next_cursor":"c2"""")
        case Some("c2")  => page(4 until 5)
        case other       => fail(s"unexpected cursor $other")
      }
    val pages = extractPages(fetch, "/things", CursorPagination(pageSize = 2))
    assert(pages.size == 3)
  }

  test("page pagination + empty first page short-circuits") {
    val pages = extractPages((_, _) => """{"data":[]}""", "/none", PagePagination(pageSize = 2))
    assert(pages.size == 1)
  }

  test("maxPages caps runaway pagination") {
    // every response is full with a cursor → would loop forever
    val fetch = (_: String, _: Map[String, String]) => page(0 until 2, ""","next_cursor":"x"""")
    assert(extractPages(fetch, "/inf", CursorPagination(pageSize = 2), maxPages = 7).size == 7)
  }

  test("pagesToDf lands records with the explicit schema") {
    val schema = new StructType().add("id", LongType).add("name", StringType)
    val df = pagesToDf(spark, Seq(page(0 until 3), page(3 until 5)), schema)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 5)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq == (0L to 4L))
  }

  test("webhook signature verification matches HMAC-SHA256 hexdigest") {
    val payload = """{"event":"x"}""".getBytes("UTF-8")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec("s3cret".getBytes, "HmacSHA256"))
    val good = mac.doFinal(payload).map("%02x".format(_)).mkString
    assert(verifyWebhookSignature("s3cret", payload, good))
    assert(!verifyWebhookSignature("s3cret", payload, good.dropRight(1) + "0"))
    assert(!verifyWebhookSignature("other", payload, good))
  }
}
