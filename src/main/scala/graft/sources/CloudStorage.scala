package graft.sources

import org.apache.spark.sql.SparkSession

/** Cloud object-store configuration surface (ref storage/aws_s3.py:20,
  * azure_blob.py:26, gcs.py:20).
  *
  * The reference wraps each store in an SDK client (boto3 / azure-sdk /
  * google-cloud-storage) and copies bytes through the driver. Spark
  * reads object stores NATIVELY through its Hadoop filesystem
  * connectors (s3a / abfss / gs) — every executor streams its own
  * byte ranges in parallel, which is the only shape that works at
  * 100 TB. So this surface is a pure option-map: typed credential/
  * endpoint config rendered onto `hadoopConfiguration` keys (the
  * public Hadoop-connector contract — hadoop-aws, hadoop-azure,
  * gcs-connector), after which `spark.read.parquet("s3a://…")` just
  * works. Same pattern as [[graft.streaming.Kafka]] options.
  *
  * Secrets hygiene: these maps hold credentials in memory; prefer the
  * provider-chain defaults (instance profiles / workload identity /
  * managed identity) by passing None and letting the connector resolve
  * ambient credentials — the explicit-key forms exist for dev
  * endpoints (MinIO, Azurite) and cross-account jobs.
  */
object CloudStorage {

  sealed trait StoreConfig {
    /** Hadoop configuration key/value pairs this config renders to. */
    def toHadoopConf: Map[String, String]
    /** URI scheme the config governs (s3a / abfss / gs). */
    def scheme: String
  }

  /** aws_s3.py:20 — keys, region, dev endpoint, role assumption.
    * Path-style access is what MinIO-style endpoints need. */
  final case class S3Config(
      accessKeyId: Option[String] = None,
      secretAccessKey: Option[String] = None,
      sessionToken: Option[String] = None,
      region: Option[String] = None,
      endpoint: Option[String] = None,
      pathStyleAccess: Boolean = false,
      assumeRoleArn: Option[String] = None) extends StoreConfig {
    def scheme = "s3a"
    def toHadoopConf: Map[String, String] = {
      val creds = (accessKeyId, secretAccessKey) match {
        case (Some(k), Some(s)) =>
          Map("fs.s3a.access.key" -> k, "fs.s3a.secret.key" -> s) ++
            sessionToken.map(t => Map(
              "fs.s3a.session.token" -> t,
              "fs.s3a.aws.credentials.provider" ->
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")).getOrElse(Map.empty)
        case _ => Map.empty[String, String] // provider chain (instance profile etc.)
      }
      val role = assumeRoleArn.map(arn => Map(
        "fs.s3a.assumed.role.arn" -> arn,
        "fs.s3a.aws.credentials.provider" ->
          "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider")).getOrElse(Map.empty)
      creds ++ role ++
        region.map("fs.s3a.endpoint.region" -> _) ++
        endpoint.map("fs.s3a.endpoint" -> _) ++
        (if (pathStyleAccess) Map("fs.s3a.path.style.access" -> "true") else Map.empty)
    }
  }

  /** azure_blob.py:26 — account key, SAS, or service-principal OAuth;
    * None of the three = managed identity (the connector's MSI flow). */
  final case class AzureConfig(
      storageAccount: String,
      accountKey: Option[String] = None,
      sasToken: Option[String] = None,
      tenantId: Option[String] = None,
      clientId: Option[String] = None,
      clientSecret: Option[String] = None) extends StoreConfig {
    def scheme = "abfss"
    private val suffix = s"$storageAccount.dfs.core.windows.net"
    def toHadoopConf: Map[String, String] = (accountKey, sasToken) match {
      case (Some(key), _) => Map(
        s"fs.azure.account.auth.type.$suffix" -> "SharedKey",
        s"fs.azure.account.key.$suffix" -> key)
      case (None, Some(sas)) => Map(
        s"fs.azure.account.auth.type.$suffix" -> "SAS",
        s"fs.azure.sas.fixed.token.$suffix" -> sas)
      case _ => (tenantId, clientId, clientSecret) match {
        case (Some(t), Some(c), Some(s)) => Map(
          s"fs.azure.account.auth.type.$suffix" -> "OAuth",
          s"fs.azure.account.oauth.provider.type.$suffix" ->
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
          s"fs.azure.account.oauth2.client.endpoint.$suffix" ->
            s"https://login.microsoftonline.com/$t/oauth2/token",
          s"fs.azure.account.oauth2.client.id.$suffix" -> c,
          s"fs.azure.account.oauth2.client.secret.$suffix" -> s)
        case _ => Map( // managed identity (azure_blob.py:45 MSI branch)
          s"fs.azure.account.auth.type.$suffix" -> "OAuth",
          s"fs.azure.account.oauth.provider.type.$suffix" ->
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider")
      }
    }
  }

  /** gcs.py:20 — project + service-account keyfile; no keyfile =
    * application-default credentials (workload identity). */
  final case class GcsConfig(
      projectId: Option[String] = None,
      serviceAccountKeyFile: Option[String] = None) extends StoreConfig {
    def scheme = "gs"
    def toHadoopConf: Map[String, String] =
      Map("fs.gs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem") ++
        projectId.map("fs.gs.project.id" -> _) ++
        serviceAccountKeyFile.map(f => Map(
          "google.cloud.auth.service.account.enable" -> "true",
          "google.cloud.auth.service.account.json.keyfile" -> f)).getOrElse(
          Map("google.cloud.auth.service.account.enable" -> "true"))
  }

  /** Apply one or more store configs to the session's Hadoop conf.
    * Returns the rendered map (what a unit test asserts, and what an
    * ops runbook can print without re-deriving key names). */
  def configure(spark: SparkSession, configs: StoreConfig*): Map[String, String] = {
    val all = configs.flatMap(_.toHadoopConf).toMap
    val hc = spark.sparkContext.hadoopConfiguration
    all.foreach { case (k, v) => hc.set(k, v) }
    all
  }

  /** A resolved store: the provider config to [[configure]] with (None
    * for the local provider) and the fully-schemed root URI every
    * read/write under it hangs from. */
  final case class Store(config: Option[StoreConfig], rootUri: String) {
    /** Join a relative path under the store root. */
    def uri(relative: String): String =
      if (relative.isEmpty) rootUri
      else s"${rootUri.stripSuffix("/")}/${relative.stripPrefix("/")}"
    /** Apply the provider config (if any) to the session and return
      * the rendered Hadoop keys. */
    def configureOn(spark: SparkSession): Map[String, String] =
      config.map(c => configure(spark, c)).getOrElse(Map.empty)
  }

  /** storage/factory.py:13 `create_storage`: the one-call by-provider
    * dispatch — validate the provider's required fields, hand back the
    * ready store. The reference returns a backend object with get/put
    * methods; on Spark the "backend" is the session's Hadoop
    * filesystem, so the store is (config to apply, root URI to read). */
  def forSettings(settings: Settings.Root, prefix: String = ""): Store = {
    val st = settings.storage
    st.provider match {
      case "aws" | "gcp" =>
        require(st.bucket.nonEmpty,
          s"storage.provider=${st.provider} requires storage.bucket (factory.py:29 contract)")
      case "azure" =>
        require(st.bucket.nonEmpty, "storage.provider=azure requires storage.bucket (container)")
        require(st.azure.isDefined,
          "storage.provider=azure requires the storage.azure section")
      case _ => () // local needs nothing
    }
    Store(st.activeConfig, Store(None, settings.warehousePath).uri(prefix))
  }

  /** storage/factory.py:82 `create_storage_for_layer`: the store
    * rooted at a medallion layer's path. */
  def forLayer(settings: Settings.Root, layer: String): Store = {
    val layerPath = layer match {
      case "bronze" => settings.medallion.bronze.path
      case "silver" => settings.medallion.silver.path
      case "gold"   => settings.medallion.gold.path
      case other => throw new IllegalArgumentException(
        s"unknown medallion layer '$other'; one of bronze, silver, gold")
    }
    forSettings(settings, layerPath.stripPrefix("/").stripSuffix("/"))
  }
}
