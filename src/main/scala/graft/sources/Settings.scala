package graft.sources

/** Unified typed settings root (ref core/config.py:62-477 `Settings`):
  * ONE aggregate object carrying the storage / medallion / extraction
  * / connector / pipeline sections, each rendering onto the typed
  * configs the library already uses ([[CloudStorage.S3Config]] /
  * [[CloudStorage.AzureConfig]] / [[CloudStorage.GcsConfig]]), with
  * flat-key loading (`storage.provider=aws`) from a Map or a
  * properties file and the reference's `${VAR}` / `${VAR:default}`
  * environment expansion.
  *
  * Deliberate deviations from the pydantic original, both in the
  * direction of failing earlier:
  *  - unknown keys are an ERROR, not ignored (`extra="ignore"` lets a
  *    typo'd `extraction.bach.size` silently run with the default);
  *  - values are validated at parse (ints parse, providers are from
  *    the known set) rather than at first use.
  *
  * Sections the reference keeps that are out of engine scope here
  * (SURVEY §7): `llm` (client plumbing), `logging`/`metrics`
  * (platform observability), `unstructured.ocr` (no codec libs —
  * the multimodal extractors carry their own typed options). */
object Settings {

  /** config.py:375 `LakehouseConfig` + :390 warehouse root. */
  final case class LakehouseSettings(
      name: String = "default_lakehouse",
      warehouse: String = "warehouse")

  /** config.py:90 `StorageConfig`: one active provider, all three
    * provider sections present so a config can describe alternates. */
  final case class StorageSettings(
      provider: String = "local",
      bucket: String = "",
      s3: CloudStorage.S3Config = CloudStorage.S3Config(),
      azure: Option[CloudStorage.AzureConfig] = None,
      gcs: CloudStorage.GcsConfig = CloudStorage.GcsConfig()) {
    require(StorageSettings.providers.contains(provider),
      s"unknown storage.provider '$provider'; one of ${StorageSettings.providers.mkString(", ")}")

    /** config.py:437 `get_storage_config`. */
    def activeConfig: Option[CloudStorage.StoreConfig] = provider match {
      case "aws"   => Some(s3)
      case "gcp"   => Some(gcs)
      case "azure" => azure
      case _       => None // local: no object-store config to apply
    }
  }
  object StorageSettings {
    val providers: Set[String] = Set("local", "aws", "gcp", "azure")
  }

  /** config.py:131 `MedallionLayerConfig`. */
  final case class LayerSettings(
      path: String,
      retentionDays: Option[Int] = None,
      partitionBy: Seq[String] = Nil)

  /** config.py:140 `MedallionConfig` with its layer defaults. */
  final case class MedallionSettings(
      bronze: LayerSettings = LayerSettings("bronze", Some(90), Seq("_ingestion_date")),
      silver: LayerSettings = LayerSettings("silver", Some(365), Seq("_processing_date")),
      gold: LayerSettings = LayerSettings("gold"))

  /** config.py:196 batch + :202 incremental sections, flattened to
    * the fields the Spark surfaces consume ([[graft.extraction]]). */
  final case class ExtractionSettings(
      defaultMode: String = "incremental",
      batchSize: Int = 100000,
      parallelWorkers: Int = 4,
      watermarkColumn: String = "updated_at",
      lookbackWindow: String = "1 hour") {
    require(Seq("full", "incremental", "cdc").contains(defaultMode),
      s"unknown extraction.defaultMode '$defaultMode'")
    require(batchSize > 0 && parallelWorkers > 0,
      "extraction batchSize/parallelWorkers must be positive")
  }

  /** config.py:294 `RetryConfig` + :317 `ConnectorsConfig`. */
  final case class ConnectorSettings(
      timeoutSeconds: Int = 30,
      retryMaxAttempts: Int = 3,
      retryBackoffFactor: Double = 2.0) {
    require(timeoutSeconds > 0 && retryMaxAttempts >= 1 && retryBackoffFactor >= 1.0,
      "connector timeout/retry settings out of range")
  }

  /** config.py:334 `PipelineConfig`. */
  final case class PipelineSettings(
      maxParallelJobs: Int = 4,
      checkpointEnabled: Boolean = true) {
    require(maxParallelJobs > 0, "pipeline.maxParallelJobs must be positive")
  }

  /** config.py:377 `Settings` — the root. */
  final case class Root(
      lakehouse: LakehouseSettings = LakehouseSettings(),
      storage: StorageSettings = StorageSettings(),
      medallion: MedallionSettings = MedallionSettings(),
      extraction: ExtractionSettings = ExtractionSettings(),
      connectors: ConnectorSettings = ConnectorSettings(),
      pipeline: PipelineSettings = PipelineSettings()) {

    /** config.py:448 `get_warehouse_path`: the provider-schemed root
      * every layer path hangs under. */
    def warehousePath: String = storage.provider match {
      case "aws"   => s"s3a://${storage.bucket}/${lakehouse.warehouse}"
      case "gcp"   => s"gs://${storage.bucket}/${lakehouse.warehouse}"
      case "azure" =>
        val az = storage.azure.getOrElse(throw new IllegalArgumentException(
          "storage.provider=azure needs storage.azure.storageAccount"))
        s"abfss://${storage.bucket}@${az.storageAccount}.dfs.core.windows.net/${lakehouse.warehouse}"
      case _ => lakehouse.warehouse
    }

    /** Flat dotted-key rendering; [[fromMap]] of this map rebuilds an
      * equal Root (the round-trip RegistrySpec pins). Defaults are
      * emitted too — a saved config is self-describing. */
    def toMap: Map[String, String] = {
      val azureMap = storage.azure.map(a => Map(
        "storage.azure.storageAccount" -> a.storageAccount) ++
        a.accountKey.map("storage.azure.accountKey" -> _) ++
        a.sasToken.map("storage.azure.sasToken" -> _)).getOrElse(Map.empty)
      Map(
        "lakehouse.name" -> lakehouse.name,
        "lakehouse.warehouse" -> lakehouse.warehouse,
        "storage.provider" -> storage.provider,
        "storage.bucket" -> storage.bucket,
        "extraction.defaultMode" -> extraction.defaultMode,
        "extraction.batchSize" -> extraction.batchSize.toString,
        "extraction.parallelWorkers" -> extraction.parallelWorkers.toString,
        "extraction.watermarkColumn" -> extraction.watermarkColumn,
        "extraction.lookbackWindow" -> extraction.lookbackWindow,
        "connectors.timeoutSeconds" -> connectors.timeoutSeconds.toString,
        "connectors.retryMaxAttempts" -> connectors.retryMaxAttempts.toString,
        "connectors.retryBackoffFactor" -> connectors.retryBackoffFactor.toString,
        "pipeline.maxParallelJobs" -> pipeline.maxParallelJobs.toString,
        "pipeline.checkpointEnabled" -> pipeline.checkpointEnabled.toString) ++
        Seq("bronze" -> medallion.bronze, "silver" -> medallion.silver,
          "gold" -> medallion.gold).flatMap { case (l, c) =>
          Map(s"medallion.$l.path" -> c.path,
            s"medallion.$l.partitionBy" -> c.partitionBy.mkString(",")) ++
            c.retentionDays.map(d => s"medallion.$l.retentionDays" -> d.toString)
        } ++
        s3Map ++ azureMap ++
        gcs2Map
    }
    private def s3Map: Map[String, String] = Seq(
      storage.s3.accessKeyId.map("storage.s3.accessKeyId" -> _),
      storage.s3.secretAccessKey.map("storage.s3.secretAccessKey" -> _),
      storage.s3.region.map("storage.s3.region" -> _),
      storage.s3.endpoint.map("storage.s3.endpoint" -> _),
      storage.s3.assumeRoleArn.map("storage.s3.assumeRoleArn" -> _),
      Option.when(storage.s3.pathStyleAccess)("storage.s3.pathStyleAccess" -> "true")).flatten.toMap
    private def gcs2Map: Map[String, String] = Seq(
      storage.gcs.projectId.map("storage.gcs.projectId" -> _),
      storage.gcs.serviceAccountKeyFile.map("storage.gcs.keyFile" -> _)).flatten.toMap
  }

  /** config.py:416 `_expand_env_vars`: `${VAR}` and `${VAR:default}`
    * in a value resolve from the environment (whole-value form, as in
    * the reference). Unresolvable without a default stays literal. */
  private[sources] def expand(v: String, env: String => Option[String]): String =
    if (v.startsWith("${") && v.endsWith("}")) {
      val inner = v.substring(2, v.length - 1)
      val (name, default) = inner.indexOf(':') match {
        case -1 => (inner, None)
        case i  => (inner.substring(0, i), Some(inner.substring(i + 1)))
      }
      env(name).orElse(default).getOrElse(v)
    } else v

  /** Build a [[Root]] from flat dotted keys. Unknown keys and
    * malformed values fail with the full list, not one at a time. */
  def fromMap(
      raw: Map[String, String],
      env: String => Option[String] = sys.env.get): Root = {
    val m = raw.view.mapValues(expand(_, env)).toMap
    val known = Root().toMap.keySet ++ Set(
      // keys optional in toMap (None defaults) are still addressable
      "storage.s3.accessKeyId", "storage.s3.secretAccessKey", "storage.s3.region",
      "storage.s3.endpoint", "storage.s3.assumeRoleArn", "storage.s3.pathStyleAccess",
      "storage.azure.storageAccount", "storage.azure.accountKey", "storage.azure.sasToken",
      "storage.gcs.projectId", "storage.gcs.keyFile",
      "medallion.bronze.retentionDays", "medallion.silver.retentionDays",
      "medallion.gold.retentionDays")
    val unknown = m.keySet -- known
    require(unknown.isEmpty,
      s"unknown settings keys: ${unknown.toSeq.sorted.mkString(", ")}")
    def str(k: String, dflt: String) = m.getOrElse(k, dflt)
    def int(k: String, dflt: Int) =
      try str(k, dflt.toString).toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"settings key $k: '${m(k)}' is not an int") }
    def dbl(k: String, dflt: Double) =
      try str(k, dflt.toString).toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"settings key $k: '${m(k)}' is not a number") }
    def bool(k: String, dflt: Boolean) = str(k, dflt.toString).toBoolean
    def layer(l: String, dflt: LayerSettings) = LayerSettings(
      path = str(s"medallion.$l.path", dflt.path),
      retentionDays = m.get(s"medallion.$l.retentionDays").map(_.toInt)
        .orElse(if (m.contains(s"medallion.$l.path")) None else dflt.retentionDays),
      partitionBy = m.get(s"medallion.$l.partitionBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(if (m.contains(s"medallion.$l.path")) Nil else dflt.partitionBy))
    val d = MedallionSettings()
    Root(
      lakehouse = LakehouseSettings(
        name = str("lakehouse.name", "default_lakehouse"),
        warehouse = str("lakehouse.warehouse", "warehouse")),
      storage = StorageSettings(
        provider = str("storage.provider", "local"),
        bucket = str("storage.bucket", ""),
        s3 = CloudStorage.S3Config(
          accessKeyId = m.get("storage.s3.accessKeyId"),
          secretAccessKey = m.get("storage.s3.secretAccessKey"),
          region = m.get("storage.s3.region"),
          endpoint = m.get("storage.s3.endpoint"),
          pathStyleAccess = bool("storage.s3.pathStyleAccess", dflt = false),
          assumeRoleArn = m.get("storage.s3.assumeRoleArn")),
        azure = m.get("storage.azure.storageAccount").map(acct =>
          CloudStorage.AzureConfig(acct,
            accountKey = m.get("storage.azure.accountKey"),
            sasToken = m.get("storage.azure.sasToken"))),
        gcs = CloudStorage.GcsConfig(
          projectId = m.get("storage.gcs.projectId"),
          serviceAccountKeyFile = m.get("storage.gcs.keyFile"))),
      medallion = MedallionSettings(
        bronze = layer("bronze", d.bronze),
        silver = layer("silver", d.silver),
        gold = layer("gold", d.gold)),
      extraction = ExtractionSettings(
        defaultMode = str("extraction.defaultMode", "incremental"),
        batchSize = int("extraction.batchSize", 100000),
        parallelWorkers = int("extraction.parallelWorkers", 4),
        watermarkColumn = str("extraction.watermarkColumn", "updated_at"),
        lookbackWindow = str("extraction.lookbackWindow", "1 hour")),
      connectors = ConnectorSettings(
        timeoutSeconds = int("connectors.timeoutSeconds", 30),
        retryMaxAttempts = int("connectors.retryMaxAttempts", 3),
        retryBackoffFactor = dbl("connectors.retryBackoffFactor", 2.0)),
      pipeline = PipelineSettings(
        maxParallelJobs = int("pipeline.maxParallelJobs", 4),
        checkpointEnabled = bool("pipeline.checkpointEnabled", dflt = true)))
  }

  /** config.py:399 `from_yaml`, properties flavor (no YAML dependency
    * in scope): `key=value` lines via java.util.Properties — same
    * dotted keys as [[fromMap]], same env expansion. */
  def fromProperties(path: String): Root = {
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    fromMap(props.asScala.toMap)
  }
}
