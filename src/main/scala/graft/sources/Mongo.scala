package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MongoDB connector surface (ref connectors/databases/mongodb.py:84
  * extract — find(filter, projection, sort, skip, limit) with `_id`
  * stringified; :145 extract_incremental; :203 aggregate).
  *
  * The mongo-spark connector jar is absent here, so — as with
  * [[graft.streaming.Kafka]] — this object owns everything decidable
  * without a server: a typed FILTER/PIPELINE builder that renders the
  * exact JSON the `mongodb` source's `aggregation.pipeline` option
  * takes (pushes filtering/projection INTO mongod, the reference pulls
  * full cursors instead), the option map for
  * `spark.read.format("mongodb")`, and extended-JSON document
  * normalization ($oid/$date/$numberLong unwrapping as codegen'd
  * column expressions) for documents landed as JSONL by any exporter.
  */
object Mongo {

  // ---- filter AST (mongodb.py:84 filter_dict, rendered not dict-built) ----

  sealed trait Filter { def json: String }
  private def lit(v: Any): String = v match {
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case other     => String.valueOf(other)
  }
  final case class Eq(field: String, v: Any) extends Filter {
    def json = s"""{${lit(field)}: ${lit(v)}}"""
  }
  final case class Cmp(field: String, op: String, v: Any) extends Filter {
    require(Set("$gt", "$gte", "$lt", "$lte", "$ne")(op), s"bad operator $op")
    def json = s"""{${lit(field)}: {${lit(op)}: ${lit(v)}}}"""
  }
  final case class In(field: String, vs: Seq[Any]) extends Filter {
    def json = s"""{${lit(field)}: {"$$in": [${vs.map(lit).mkString(", ")}]}}"""
  }
  final case class Regex(field: String, pattern: String) extends Filter {
    def json = s"""{${lit(field)}: {"$$regex": ${lit(pattern)}}}"""
  }
  final case class Exists(field: String, exists: Boolean = true) extends Filter {
    def json = s"""{${lit(field)}: {"$$exists": $exists}}"""
  }
  final case class And(fs: Filter*) extends Filter {
    def json = s"""{"$$and": [${fs.map(_.json).mkString(", ")}]}"""
  }
  final case class Or(fs: Filter*) extends Filter {
    def json = s"""{"$$or": [${fs.map(_.json).mkString(", ")}]}"""
  }

  /** mongodb.py:84's find() arguments as an aggregation pipeline — the
    * form the Spark connector pushes down ($match/$project/$sort/$skip/
    * $limit stages, in that order). */
  def findPipeline(
      filter: Option[Filter] = None,
      projection: Seq[String] = Nil,
      sort: Seq[(String, Int)] = Nil,
      skip: Option[Long] = None,
      limit: Option[Long] = None): Seq[String] = {
    val match_ = filter.map(f => s"""{"$$match": ${f.json}}""")
    val proj = Option.when(projection.nonEmpty)(
      s"""{"$$project": {${projection.map(f => s"${lit(f)}: 1").mkString(", ")}}}""")
    val sort_ = Option.when(sort.nonEmpty)(
      s"""{"$$sort": {${sort.map { case (f, d) => s"${lit(f)}: $d" }.mkString(", ")}}}""")
    (match_ ++ proj ++ sort_ ++ skip.map(n => s"""{"$$skip": $n}""") ++
      limit.map(n => s"""{"$$limit": $n}""")).toSeq
  }

  /** mongodb.py:145 extract_incremental: watermark filter stage. */
  def incrementalPipeline(watermarkColumn: String, lastWatermark: Option[Any]): Seq[String] =
    findPipeline(
      filter = lastWatermark.map(w => Cmp(watermarkColumn, "$gt", w)),
      sort = Seq(watermarkColumn -> 1))

  // ---- connector options ----

  final case class MongoSourceConfig(
      uri: String,
      database: String,
      collection: String,
      pipeline: Seq[String] = Nil,
      extraOptions: Map[String, String] = Map.empty) {
    /** Options for `spark.read.format("mongodb")` — pure, unit-tested. */
    def options: Map[String, String] =
      Map(
        "connection.uri" -> uri,
        "database" -> database,
        "collection" -> collection) ++
        Option.when(pipeline.nonEmpty)(
          "aggregation.pipeline" -> pipeline.mkString("[", ", ", "]")) ++
        extraOptions
  }

  /** The live source: the only line that needs the mongo-spark jar. */
  def read(spark: SparkSession, cfg: MongoSourceConfig): DataFrame =
    spark.read.format("mongodb").options(cfg.options).load()

  // ---- extended-JSON landing (documents exported as JSONL) ----

  /** Unwrap MongoDB extended-JSON scalars so a plain schema parses the
    * document: {"$oid": "x"} → "x" (mongodb.py:124's str(_id)),
    * {"$date": "..."} → the ISO string, {"$numberLong": "n"} → n.
    * Pure string surgery, codegen'd, runs before from_json. */
  def normalizeExtendedJson(raw: Column): Column = {
    val oid = regexp_replace(raw, """\{\s*"\$oid"\s*:\s*("[^"]*")\s*\}""", "$1")
    val date = regexp_replace(oid, """\{\s*"\$date"\s*:\s*("[^"]*")\s*\}""", "$1")
    regexp_replace(date, """\{\s*"\$numberLong"\s*:\s*"(-?\d+)"\s*\}""", "$1")
  }

  /** JSONL-exported documents → typed rows under an explicit schema. */
  def documentsToDf(docs: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    docs.select(from_json(normalizeExtendedJson(col(jsonCol)), schema).as("_d"))
      .select(col("_d.*"))
}
