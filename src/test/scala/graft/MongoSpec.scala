package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Mongo
import graft.sources.Mongo._

/** MongoDB surface without a server: filter AST rendering, pipeline
  * assembly, option map, extended-JSON normalization into typed rows.
  */
class MongoSpec extends SparkSpec {

  test("filter AST renders mongo query JSON") {
    assert(Eq("status", "active").json == """{"status": "active"}""")
    assert(Cmp("ts", "$gt", 1700).json == """{"ts": {"$gt": 1700}}""")
    assert(In("kind", Seq("a", "b")).json == """{"kind": {"$in": ["a", "b"]}}""")
    assert(And(Eq("a", 1), Or(Eq("b", 2), Exists("c"))).json ==
      """{"$and": [{"a": 1}, {"$or": [{"b": 2}, {"c": {"$exists": true}}]}]}""")
    assert(Regex("name", "^gr.ft$").json == """{"name": {"$regex": "^gr.ft$"}}""")
    intercept[IllegalArgumentException](Cmp("x", "$bogus", 1))
  }

  test("findPipeline orders $match/$project/$sort/$skip/$limit") {
    val p = findPipeline(
      filter = Some(Cmp("v", "$gte", 10)),
      projection = Seq("v", "k"),
      sort = Seq("v" -> -1),
      skip = Some(5), limit = Some(20))
    assert(p == Seq(
      """{"$match": {"v": {"$gte": 10}}}""",
      """{"$project": {"v": 1, "k": 1}}""",
      """{"$sort": {"v": -1}}""",
      """{"$skip": 5}""",
      """{"$limit": 20}"""))
    assert(incrementalPipeline("ts", Some(99)) ==
      Seq("""{"$match": {"ts": {"$gt": 99}}}""", """{"$sort": {"ts": 1}}"""))
    assert(incrementalPipeline("ts", None) == Seq("""{"$sort": {"ts": 1}}"""))
  }

  test("option map carries uri/database/collection and the pipeline") {
    val cfg = MongoSourceConfig("mongodb://h:27017", "shop", "orders",
      pipeline = incrementalPipeline("ts", Some(5)))
    val o = cfg.options
    assert(o("connection.uri") == "mongodb://h:27017")
    assert(o("database") == "shop" && o("collection") == "orders")
    assert(o("aggregation.pipeline") ==
      """[{"$match": {"ts": {"$gt": 5}}}, {"$sort": {"ts": 1}}]""")
  }

  test("extended JSON normalizes and lands under an explicit schema") {
    import spark.implicits._
    val docs = Seq(
      """{"_id": {"$oid": "65ab"}, "n": {"$numberLong": "42"}, "at": {"$date": "2024-01-01T00:00:00Z"}, "name": "x"}""",
      """{"_id": "plain", "n": 7, "at": "2024-02-02T00:00:00Z", "name": "y"}"""
    ).toDF("doc")
    val schema = new StructType()
      .add("_id", StringType).add("n", LongType)
      .add("at", StringType).add("name", StringType)
    val out = Mongo.documentsToDf(docs, "doc", schema)
      .orderBy("name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq(("65ab", 42L, "x"), ("plain", 7L, "y")))
  }
}
