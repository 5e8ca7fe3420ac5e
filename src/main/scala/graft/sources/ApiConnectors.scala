package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed SaaS API connectors (ref connectors/api/stripe.py:84,
  * salesforce.py:150-220, hubspot.py:167-198) — service-specific
  * specializations over [[Rest]]'s generic machinery.
  *
  * Each service is its own pagination dialect around the same shape:
  * drive the injected `fetch: (endpoint, params) ⇒ body` edge through
  * a service-specific state machine, land the accumulated pages
  * against an EXPLICIT record schema (never inferred), and from there
  * the cleaning/dedup/SCD2 machinery applies unchanged. Like [[Rest]],
  * everything except the HTTP call itself is deterministic and
  * unit-tested against fixture bodies:
  *
  *   - Stripe (stripe.py:84 `_paginate`): cursor pagination where the
  *     cursor is DERIVED FROM THE DATA — `starting_after` = id of the
  *     last record of the previous page — and `has_more` gates
  *     continuation (not page fullness);
  *   - Salesforce (salesforce.py:174-185): SOQL query pagination where
  *     the SERVER names the next endpoint (`nextRecordsUrl`) and
  *     `done` gates continuation — the endpoint changes per page, the
  *     params don't;
  *   - HubSpot (hubspot.py:167 `_get_crm_objects`): token pagination
  *     where the token hides two levels deep (`paging.next.after`) and
  *     records carry their fields in a nested `properties` object that
  *     flattens on landing.
  */
object ApiConnectors {

  import Rest.ujsonLite

  /** stripe.py:43-55 + :84. */
  object Stripe {

    /** Bearer key + the pinned API version header (stripe.py:55). */
    def headers(apiKey: String, apiVersion: String = "2023-10-16"): Map[String, String] =
      Rest.buildHeaders(Rest.Bearer(apiKey), Map("Stripe-Version" -> apiVersion))

    /** stripe.py:84: GET pages of `endpoint` until `has_more` is
      * false; each next request passes `starting_after` = last id of
      * the previous page. `extraParams` carries list filters like
      * `created[gte]` (stripe.py:128). */
    def extractPages(
        fetch: (String, Map[String, String]) => String,
        endpoint: String,
        pageSize: Int = 100,
        extraParams: Map[String, String] = Map.empty,
        maxPages: Int = 1000): Seq[String] = {
      val base = extraParams + ("limit" -> pageSize.toString)
      val out = Seq.newBuilder[String]
      var params = Option(base)
      var pages = 0
      while (params.isDefined && pages < maxPages) {
        val body = fetch(endpoint, params.get)
        out += body
        pages += 1
        val parsed = ujsonLite.Obj(body)
        val hasMore = Option(parsed.node.get("has_more")).exists(n => n.isBoolean && n.asBoolean())
        val lastId = parsed.arr("data").lastOption
          .flatMap(r => Option(r.get("id")).filter(_.isTextual).map(_.asText()))
        params = (hasMore, lastId) match {
          case (true, Some(id)) => Some(base + ("starting_after" -> id))
          case _                => None
        }
      }
      out.result()
    }

    /** Core list-object fields (stripe.py:110-230); money amounts are
      * integer minor units, timestamps epoch seconds — both land as
      * LongType, exactly as the wire carries them. */
    val customerSchema: StructType = new StructType()
      .add("id", StringType).add("object", StringType).add("email", StringType)
      .add("name", StringType).add("created", LongType).add("livemode", BooleanType)
    val chargeSchema: StructType = new StructType()
      .add("id", StringType).add("object", StringType).add("amount", LongType)
      .add("currency", StringType).add("customer", StringType)
      .add("status", StringType).add("created", LongType)

    def land(spark: SparkSession, pages: Seq[String], schema: StructType): DataFrame =
      Rest.pagesToDf(spark, pages, schema, dataKey = "data")
  }

  /** salesforce.py:150-220. */
  object Salesforce {

    val RestApiVersion = "v58.0" // salesforce.py:30

    /** salesforce.py:174: GET `/services/data/<ver>/query?q=<soql>`,
      * then follow the server-issued `nextRecordsUrl` while `done` is
      * false. `queryAll = true` hits the deleted/archived-inclusive
      * endpoint (salesforce.py:211). */
    def queryPages(
        fetch: (String, Map[String, String]) => String,
        soql: String,
        apiVersion: String = RestApiVersion,
        queryAll: Boolean = false,
        maxPages: Int = 1000): Seq[String] = {
      val verb = if (queryAll) "queryAll" else "query"
      val out = Seq.newBuilder[String]
      var endpoint = Option(s"/services/data/$apiVersion/$verb")
      var params = Map("q" -> soql)
      var pages = 0
      while (endpoint.isDefined && pages < maxPages) {
        val body = fetch(endpoint.get, params)
        out += body
        pages += 1
        val parsed = ujsonLite.Obj(body)
        val done = Option(parsed.node.get("done")).forall(n => !n.isBoolean || n.asBoolean())
        endpoint = if (done) None else parsed.str("nextRecordsUrl")
        params = Map.empty // nextRecordsUrl is self-contained (salesforce.py:183)
      }
      out.result()
    }

    /** Land `records` against an explicit object schema. The per-record
      * `attributes` envelope (salesforce.py:187-189 strips it) simply
      * isn't in the schema, so it never lands. */
    def land(spark: SparkSession, pages: Seq[String], schema: StructType): DataFrame =
      Rest.pagesToDf(spark, pages, schema, dataKey = "records")
  }

  /** hubspot.py:167-198. */
  object HubSpot {

    /** hubspot.py:172: GET `/crm/v3/objects/<type>` pages; the next
      * token is `paging.next.after`, absent on the last page. The
      * `properties` param selects which object fields the API returns
      * (comma-joined, hubspot.py:179). */
    def objectPages(
        fetch: (String, Map[String, String]) => String,
        objectType: String,
        properties: Seq[String] = Seq.empty,
        pageSize: Int = 100,
        maxPages: Int = 1000): Seq[String] = {
      val endpoint = s"/crm/v3/objects/$objectType"
      val base = Map("limit" -> pageSize.toString) ++
        (if (properties.nonEmpty) Map("properties" -> properties.mkString(",")) else Map.empty)
      val out = Seq.newBuilder[String]
      var after = Option.empty[String]
      var continue = true
      var pages = 0
      while (continue && pages < maxPages) {
        val body = fetch(endpoint, base ++ after.map("after" -> _))
        out += body
        pages += 1
        val next = ujsonLite.Obj(body).node.path("paging").path("next").path("after")
        after = if (next.isTextual) Some(next.asText()) else None
        continue = after.isDefined
      }
      out.result()
    }

    /** Land `results` rows flattened to (id, <property columns>) — the
      * hubspot.py:187 flat_record shape, done relationally: explode the
      * results array, then project `properties.*` beside `id`. */
    def land(spark: SparkSession, pages: Seq[String], propertySchema: StructType): DataFrame = {
      val recordSchema = new StructType()
        .add("id", StringType).add("properties", propertySchema)
      val nested = Rest.pagesToDf(spark, pages, recordSchema, dataKey = "results")
      nested.select(col("id") +: propertySchema.fieldNames.toIndexedSeq
        .map(f => col(s"properties.$f").as(f)): _*)
    }
  }

  /** Watermark-friendly helper shared by the flavors: every landed
    * frame can feed [[graft.extraction.Incremental.extract]] on its
    * `created`/timestamp column — API extracts are incremental by
    * filter param (e.g. Stripe `created[gte]`), and the watermark
    * manager supplies that value across runs. */
  def incrementalParam(key: String, watermark: Option[String]): Map[String, String] =
    watermark.map(w => Map(key -> w)).getOrElse(Map.empty)
}
