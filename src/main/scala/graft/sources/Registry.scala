package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector registry (ref connectors/registry.py:10
  * `ConnectorRegistry`, :87 `get_connector`): the by-NAME lookup a
  * config-driven pipeline uses — "source: postgresql" in a job spec
  * resolves here, with aliases ("postgres", "mongo", "hf") and an
  * unknown-name error that lists what IS available, the reference's
  * exact failure shape.
  *
  * A connector is a `(SparkSession, options) => DataFrame` loader —
  * the natural Spark shape (everything downstream composes on the
  * DataFrame). Builtins bind the library's existing typed surfaces
  * ([[Connectors]], [[Jdbc]], [[Snowflake]], [[BigQuery]],
  * [[HuggingFace]], the multimodal extractors); [[register]] lets a
  * deployment add or override connectors without touching this file
  * (the reference's class-level register, later registration wins). */
object Registry {

  type Loader = (SparkSession, Map[String, String]) => DataFrame

  private val connectors = scala.collection.mutable.LinkedHashMap.empty[String, Loader]

  /** registry.py:16 `register`. */
  def register(name: String, loader: Loader): Unit =
    connectors(name.toLowerCase) = loader

  /** registry.py:21 `get`. */
  def get(name: String): Option[Loader] = connectors.get(name.toLowerCase)

  /** registry.py:26 `list_connectors`. */
  def listConnectors: Seq[String] = connectors.keys.toSeq.sorted

  private def opt(o: Map[String, String], key: String): String =
    o.getOrElse(key,
      throw new IllegalArgumentException(s"connector option '$key' is required"))

  /** registry.py:87 `get_connector` + extract, collapsed to the Spark
    * shape: resolve by name, load a DataFrame. */
  def load(name: String, spark: SparkSession, options: Map[String, String]): DataFrame =
    get(name).getOrElse(throw new IllegalArgumentException(
      s"Unknown connector type: $name. Available: ${listConnectors.mkString(", ")}"))
      .apply(spark, options)

  // ---- builtins (registry.py:40 `_register_builtin_connectors`) ----

  register("csv", (s, o) => Connectors.readCsv(s, opt(o, "path"),
    options = Connectors.CsvOptions(
      delimiter = o.getOrElse("delimiter", ","),
      header = o.getOrElse("header", "true").toBoolean),
    // config-driven reads have no compiled schema to hand over;
    // inference's extra scan is the documented cost of that mode
    inferSchema = true))
  register("json", (s, o) => Connectors.readJson(s, opt(o, "path"),
    multiLine = o.getOrElse("multiLine", "false").toBoolean))
  register("parquet", (s, o) => Connectors.readParquet(s, opt(o, "path"),
    mergeSchema = o.getOrElse("mergeSchema", "false").toBoolean))
  register("binary", (s, o) =>
    Connectors.readBinaryFiles(s, opt(o, "path"), o.get("pattern")))

  // stride partitioning comes from the four partition* options when
  // all are present
  private def partitioningOf(o: Map[String, String]) = for {
    c <- o.get("partitionColumn"); lo <- o.get("lowerBound")
    hi <- o.get("upperBound"); n <- o.get("numPartitions")
  } yield Jdbc.JdbcPartitioning(c, lo.toLong, hi.toLong, n.toInt)

  register("jdbc", (s, o) => Jdbc.read(s,
    Jdbc.JdbcSource(url = opt(o, "url"), driver = o.get("driver"),
      user = o.get("user"), password = o.get("password")),
    opt(o, "table"), partitioning = partitioningOf(o)))

  // dialect names take the typed configs (host/database/...; SSL and
  // charset surfaces — ref postgresql.py:23, mysql.py:23) and fall
  // back to the generic surface when a raw url is given instead
  for (n <- Seq("postgresql", "postgres"))
    register(n, (s, o) =>
      if (o.contains("url")) load("jdbc", s, o)
      else Dialects.PostgreSql.read(s, Dialects.PostgreSql.Source(
        host = opt(o, "host"), database = opt(o, "database"),
        user = opt(o, "user"), password = opt(o, "password"),
        port = o.getOrElse("port", "5432").toInt,
        schema = o.getOrElse("schema", "public"),
        sslMode = o.getOrElse("sslMode", "prefer")),
        opt(o, "table"), partitioningOf(o)))

  register("mysql", (s, o) =>
    if (o.contains("url")) load("jdbc", s, o)
    else Dialects.MySql.read(s, Dialects.MySql.Source(
      host = opt(o, "host"), database = opt(o, "database"),
      user = opt(o, "user"), password = opt(o, "password"),
      port = o.getOrElse("port", "3306").toInt,
      charset = o.getOrElse("charset", "utf8mb4"),
      sslMode = o.getOrElse("sslMode", "PREFERRED")),
      opt(o, "table"), partitioningOf(o)))

  register("snowflake", (s, o) => Snowflake.read(s,
    Snowflake.SnowflakeSource(
      account = opt(o, "account"),
      auth = Snowflake.Password(opt(o, "user"), opt(o, "password")),
      database = o.get("database"), schema = o.get("schema"),
      warehouse = o.get("warehouse"), role = o.get("role")),
    opt(o, "table")))

  register("bigquery", (s, o) => BigQuery.read(s,
    BigQuery.BigQuerySource(
      project = opt(o, "project"),
      credentialsFile = o.get("credentialsFile"),
      credentialsBase64 = o.get("credentials"),
      dataset = o.get("dataset")),
    opt(o, "table")))

  for (n <- Seq("huggingface", "hf"))
    register(n, (s, o) => HuggingFace.readSplit(s, opt(o, "root"),
      o.getOrElse("split", "train")))

  for (n <- Seq("audio", "wav"))
    register(n, (s, o) => graft.multimodal.Audio.extractMetadata(
      Connectors.readBinaryFiles(s, opt(o, "path"), o.get("pattern").orElse(Some("*.wav")))))
  register("video", (s, o) => graft.multimodal.Video.extractMetadata(
    Connectors.readBinaryFiles(s, opt(o, "path"), o.get("pattern").orElse(Some("*.mp4")))))
  for (n <- Seq("pdf", "document", "docx", "word"))
    register(n, (s, o) => graft.multimodal.DocumentExtract.extractDocuments(
      Connectors.readBinaryFiles(s, opt(o, "path"), o.get("pattern")),
      "path", "content"))
}
