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

  // ---- typed API flavors (ApiConnectors) over fixture bodies ----

  test("Stripe: starting_after cursor derives from the last data id, has_more gates") {
    import graft.sources.ApiConnectors.Stripe
    val calls = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    def body(ids: Seq[String], hasMore: Boolean): String =
      s"""{"object":"list","has_more":$hasMore,"data":[${ids.map(i =>
        s"""{"id":"$i","object":"customer","email":"$i@x.io","name":"N $i","created":1700000000,"livemode":false}""")
        .mkString(",")}]}"""
    val fetch = (endpoint: String, params: Map[String, String]) => {
      assert(endpoint == "/v1/customers")
      calls += params
      params.get("starting_after") match {
        case None        => body(Seq("cus_1", "cus_2"), hasMore = true)
        case Some("cus_2") => body(Seq("cus_3"), hasMore = false)
        case other       => fail(s"unexpected cursor $other")
      }
    }
    val pages = Stripe.extractPages(fetch, "/v1/customers", pageSize = 2,
      extraParams = Map("created[gte]" -> "1690000000"))
    assert(pages.size == 2)
    assert(calls.forall(_("created[gte]") == "1690000000")) // filters ride every page
    val df = Stripe.land(spark, pages, Stripe.customerSchema)
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "object", "email", "name", "created", "livemode"))
    assert(Stripe.headers("sk_test")("Stripe-Version") == "2023-10-16")
  }

  test("Salesforce: nextRecordsUrl endpoint-following until done") {
    import graft.sources.ApiConnectors.Salesforce
    val endpoints = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetch = (endpoint: String, params: Map[String, String]) => {
      endpoints += endpoint
      endpoint match {
        case "/services/data/v58.0/query" =>
          assert(params("q") == "SELECT Id, Name FROM Account")
          """{"totalSize":3,"done":false,"nextRecordsUrl":"/services/data/v58.0/query/01g-2000",
             "records":[{"attributes":{"type":"Account"},"Id":"001A","Name":"Acme"},
                        {"attributes":{"type":"Account"},"Id":"001B","Name":"Globex"}]}"""
        case "/services/data/v58.0/query/01g-2000" =>
          assert(params.isEmpty) // the URL is self-contained
          """{"totalSize":3,"done":true,
             "records":[{"attributes":{"type":"Account"},"Id":"001C","Name":"Initech"}]}"""
        case other => fail(s"unexpected endpoint $other")
      }
    }
    val pages = Salesforce.queryPages(fetch, "SELECT Id, Name FROM Account")
    assert(pages.size == 2)
    assert(endpoints.toSeq ==
      Seq("/services/data/v58.0/query", "/services/data/v58.0/query/01g-2000"))
    val schema = new StructType().add("Id", StringType).add("Name", StringType)
    val df = Salesforce.land(spark, pages, schema)
    assert(df.columns.toSeq == Seq("Id", "Name")) // attributes envelope never lands
    assert(df.orderBy("Id").collect().map(_.getString(1)).toSeq ==
      Seq("Acme", "Globex", "Initech"))
  }

  test("HubSpot: paging.next.after token, nested properties flatten on landing") {
    import graft.sources.ApiConnectors.HubSpot
    val calls = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    def contact(id: String, email: String): String =
      s"""{"id":"$id","properties":{"email":"$email","firstname":"F$id"},"archived":false}"""
    val fetch = (endpoint: String, params: Map[String, String]) => {
      assert(endpoint == "/crm/v3/objects/contacts")
      assert(params("properties") == "email,firstname")
      calls += params
      params.get("after") match {
        case None       => s"""{"results":[${contact("1", "a@x.io")},${contact("2", "b@x.io")}],
                               "paging":{"next":{"after":"pg2","link":"…"}}}"""
        case Some("pg2") => s"""{"results":[${contact("3", "c@x.io")}]}"""
        case other      => fail(s"unexpected after $other")
      }
    }
    val pages = HubSpot.objectPages(fetch, "contacts", properties = Seq("email", "firstname"))
    assert(pages.size == 2 && calls.size == 2)
    val props = new StructType().add("email", StringType).add("firstname", StringType)
    val df = HubSpot.land(spark, pages, props)
    assert(df.columns.toSeq == Seq("id", "email", "firstname"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a@x.io", "b@x.io", "c@x.io"))
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
