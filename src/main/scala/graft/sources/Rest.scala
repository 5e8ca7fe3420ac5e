package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** REST/API connector surface (ref connectors/api/rest.py:81
  * `_build_headers`, :98 `_handle_rate_limit`, :185 `paginate`, :330
  * `verify_signature`; stripe.py:84 `_paginate` is the cursor flavor).
  *
  * An API extract is inherently a DRIVER-SIDE edge: a rate-limited,
  * sequentially-paginated HTTP conversation — there is nothing to
  * distribute until the pages land. So the connector separates the two
  * cleanly: everything decidable without a network — auth headers,
  * pagination state machines, rate-limit spacing, webhook signature
  * verification, page-JSON → DataFrame landing — is implemented and
  * unit-tested here; the single non-deterministic edge is an injected
  * `fetch: (endpoint, params) ⇒ body` function (production plugs an
  * HTTP client in; tests plug a fixture map). Landed pages become a
  * DataFrame via an EXPLICIT record schema and from that point on the
  * 100 TB machinery (silver cleaning, dedup, SCD2) applies unchanged.
  */
object Rest {

  // ---- auth (rest.py:81) ----

  sealed trait Auth { def headers: Map[String, String] }
  final case class ApiKey(key: String, headerName: String = "X-API-Key") extends Auth {
    def headers: Map[String, String] = Map(headerName -> key)
  }
  final case class Bearer(token: String) extends Auth {
    def headers: Map[String, String] = Map("Authorization" -> s"Bearer $token")
  }
  final case class Basic(username: String, password: String) extends Auth {
    def headers: Map[String, String] = Map("Authorization" -> ("Basic " +
      Base64.getEncoder.encodeToString(s"$username:$password".getBytes(StandardCharsets.UTF_8))))
  }
  case object NoAuth extends Auth { def headers: Map[String, String] = Map.empty }

  def buildHeaders(auth: Auth, custom: Map[String, String] = Map.empty): Map[String, String] =
    Map("Content-Type" -> "application/json") ++ custom ++ auth.headers

  /** rest.py:98: requests/minute → minimum spacing between calls. */
  def minIntervalMs(requestsPerMinute: Int): Long = {
    require(requestsPerMinute > 0, "rate limit must be positive")
    (60000.0 / requestsPerMinute).ceil.toLong
  }

  // ---- pagination state machines (rest.py:185, stripe.py:84) ----

  /** One page-turn: given the page index and the previous response,
    * the params for the next request — or None when done. All three
    * reference modes reduce to this pure step. */
  sealed trait Pagination {
    def pageSize: Int
    def firstParams: Map[String, String]
    def nextParams(pageIndex: Int, prevBody: ujsonLite.Obj): Option[Map[String, String]]
  }

  /** `?limit=&offset=` — stops when a short page arrives. */
  final case class OffsetPagination(pageSize: Int = 100, dataKey: String = "data")
      extends Pagination {
    def firstParams: Map[String, String] = Map("limit" -> pageSize.toString, "offset" -> "0")
    def nextParams(i: Int, prev: ujsonLite.Obj): Option[Map[String, String]] =
      if (prev.arr(dataKey).size < pageSize) None
      else Some(Map("limit" -> pageSize.toString, "offset" -> (i * pageSize).toString))
  }

  /** `?per_page=&page=` — 1-based page numbers. */
  final case class PagePagination(pageSize: Int = 100, dataKey: String = "data")
      extends Pagination {
    def firstParams: Map[String, String] = Map("per_page" -> pageSize.toString, "page" -> "1")
    def nextParams(i: Int, prev: ujsonLite.Obj): Option[Map[String, String]] =
      if (prev.arr(dataKey).size < pageSize) None
      else Some(Map("per_page" -> pageSize.toString, "page" -> (i + 1).toString))
  }

  /** `?limit=&cursor=` — follows `next_cursor`/`cursor` from the body
    * (stripe's `starting_after` is this shape with a different key). */
  final case class CursorPagination(
      pageSize: Int = 100, dataKey: String = "data",
      cursorKeys: Seq[String] = Seq("next_cursor", "cursor"),
      cursorParam: String = "cursor") extends Pagination {
    def firstParams: Map[String, String] = Map("limit" -> pageSize.toString)
    def nextParams(i: Int, prev: ujsonLite.Obj): Option[Map[String, String]] =
      cursorKeys.iterator.flatMap(prev.str).nextOption()
        .map(c => Map("limit" -> pageSize.toString, cursorParam -> c))
  }

  /** Wrap a fetch function so every call retries under the policy
    * (ref core/retry.py:17 via rest.py's session retries): the edge
    * [[extractPages]] drives is exactly where one flaky TCP reset
    * should back off instead of killing the extraction. */
  def retrying(
      fetch: (String, Map[String, String]) => String,
      policy: graft.ops.Retry.Policy = graft.ops.Retry.Policy())
      : (String, Map[String, String]) => String =
    (endpoint, params) => policy.execute(() => fetch(endpoint, params))

  /** rest.py:253 `extract`: drive `fetch` through the pagination state
    * machine, returning raw page bodies. The fetch function is the ONE
    * injected non-deterministic edge. */
  def extractPages(
      fetch: (String, Map[String, String]) => String,
      endpoint: String,
      pagination: Pagination,
      maxPages: Int = 1000): Seq[String] = {
    val out = Seq.newBuilder[String]
    var params = Option(pagination.firstParams)
    var i = 0
    while (params.isDefined && i < maxPages) {
      val body = fetch(endpoint, params.get)
      out += body
      i += 1
      val parsed = ujsonLite.Obj(body)
      params =
        if (parsed.arr(paginationDataKey(pagination)).isEmpty) None
        else pagination.nextParams(i, parsed)
    }
    out.result()
  }

  private def paginationDataKey(p: Pagination): String = p match {
    case o: OffsetPagination => o.dataKey
    case o: PagePagination   => o.dataKey
    case o: CursorPagination => o.dataKey
  }

  /** Land fetched pages as a typed DataFrame: each page's `dataKey`
    * array explodes into one row per record, parsed against an EXPLICIT
    * schema (the silver layer's input contract — never inferred). */
  def pagesToDf(
      spark: SparkSession, pages: Seq[String],
      recordSchema: StructType, dataKey: String = "data"): DataFrame = {
    import spark.implicits._
    val pageSchema = new StructType()
      .add(dataKey, org.apache.spark.sql.types.ArrayType(recordSchema))
    pages.toDF("_body")
      .select(explode(from_json(col("_body"), pageSchema).getField(dataKey)).as("_r"))
      .select(col("_r.*"))
  }

  /** rest.py:330 webhook signature verification: HMAC-SHA256 hexdigest,
    * constant-time compare. */
  def verifyWebhookSignature(secret: String, payload: Array[Byte], signature: String): Boolean = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    val expected = mac.doFinal(payload).map("%02x".format(_)).mkString
    java.security.MessageDigest.isEqual(
      expected.getBytes(StandardCharsets.US_ASCII), signature.getBytes(StandardCharsets.US_ASCII))
  }

  /** Minimal JSON probe for pagination bookkeeping (string fields and
    * data-array size only — full record parsing happens in Spark via
    * [[pagesToDf]]). Backed by Jackson, which Spark itself ships on
    * this classpath. */
  private[sources] object ujsonLite {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    private val mapper = new ObjectMapper()
    final case class Obj(node: JsonNode) {
      def str(key: String): Option[String] =
        Option(node.get(key)).filter(_.isTextual).map(_.asText())
      def arr(key: String): Seq[JsonNode] = {
        val n = node.get(key)
        if (n == null || !n.isArray) Seq.empty
        else (0 until n.size()).map(n.get)
      }
    }
    object Obj { def apply(json: String): Obj = Obj(mapper.readTree(json)) }
  }
}
