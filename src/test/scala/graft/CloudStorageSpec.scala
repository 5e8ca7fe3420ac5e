package graft

import graft.sources.CloudStorage
import graft.sources.CloudStorage.{AzureConfig, GcsConfig, S3Config}

/** Cloud-store option maps render the exact Hadoop-connector keys. */
class CloudStorageSpec extends SparkSpec {

  test("s3a: explicit keys, session token, dev endpoint, path style") {
    val conf = S3Config(
      accessKeyId = Some("AKIA123"), secretAccessKey = Some("s3cr3t"),
      sessionToken = Some("tok"), region = Some("eu-west-1"),
      endpoint = Some("http://minio:9000"), pathStyleAccess = true).toHadoopConf
    assert(conf("fs.s3a.access.key") == "AKIA123")
    assert(conf("fs.s3a.secret.key") == "s3cr3t")
    assert(conf("fs.s3a.session.token") == "tok")
    assert(conf("fs.s3a.aws.credentials.provider").contains("TemporaryAWSCredentialsProvider"))
    assert(conf("fs.s3a.endpoint") == "http://minio:9000")
    assert(conf("fs.s3a.endpoint.region") == "eu-west-1")
    assert(conf("fs.s3a.path.style.access") == "true")
  }

  test("s3a: no explicit credentials leaves the provider chain alone; role assumption renders") {
    val ambient = S3Config(region = Some("us-east-1")).toHadoopConf
    assert(!ambient.contains("fs.s3a.access.key") && !ambient.contains("fs.s3a.aws.credentials.provider"))
    val role = S3Config(assumeRoleArn = Some("arn:aws:iam::1:role/etl")).toHadoopConf
    assert(role("fs.s3a.assumed.role.arn") == "arn:aws:iam::1:role/etl")
    assert(role("fs.s3a.aws.credentials.provider").contains("AssumedRoleCredentialProvider"))
  }

  test("abfss: SharedKey, SAS, service-principal OAuth, and MSI variants") {
    val sfx = "acct.dfs.core.windows.net"
    val key = AzureConfig("acct", accountKey = Some("k==")).toHadoopConf
    assert(key(s"fs.azure.account.auth.type.$sfx") == "SharedKey")
    assert(key(s"fs.azure.account.key.$sfx") == "k==")
    val sas = AzureConfig("acct", sasToken = Some("sv=…")).toHadoopConf
    assert(sas(s"fs.azure.account.auth.type.$sfx") == "SAS")
    assert(sas(s"fs.azure.sas.fixed.token.$sfx") == "sv=…")
    val spn = AzureConfig("acct", tenantId = Some("t"), clientId = Some("c"),
      clientSecret = Some("s")).toHadoopConf
    assert(spn(s"fs.azure.account.auth.type.$sfx") == "OAuth")
    assert(spn(s"fs.azure.account.oauth2.client.endpoint.$sfx") ==
      "https://login.microsoftonline.com/t/oauth2/token")
    assert(spn(s"fs.azure.account.oauth.provider.type.$sfx").contains("ClientCredsTokenProvider"))
    val msi = AzureConfig("acct").toHadoopConf
    assert(msi(s"fs.azure.account.oauth.provider.type.$sfx").contains("MsiTokenProvider"))
  }

  test("gs: keyfile and application-default-credential forms") {
    val keyed = GcsConfig(projectId = Some("proj"),
      serviceAccountKeyFile = Some("/secrets/sa.json")).toHadoopConf
    assert(keyed("fs.gs.project.id") == "proj")
    assert(keyed("google.cloud.auth.service.account.json.keyfile") == "/secrets/sa.json")
    val adc = GcsConfig().toHadoopConf
    assert(adc("google.cloud.auth.service.account.enable") == "true")
    assert(!adc.contains("google.cloud.auth.service.account.json.keyfile"))
  }

  test("configure applies every rendered key to the session's hadoopConfiguration") {
    val applied = CloudStorage.configure(spark,
      S3Config(endpoint = Some("http://minio:9000"), pathStyleAccess = true),
      GcsConfig(projectId = Some("proj")))
    val hc = spark.sparkContext.hadoopConfiguration
    applied.foreach { case (k, v) => assert(hc.get(k) == v, s"missing $k") }
    assert(hc.get("fs.s3a.path.style.access") == "true")
  }

  test("forSettings: one-call provider dispatch (factory.py:13) — config + schemed root, bucket validation") {
    import graft.sources.Settings
    val aws = Settings.Root(storage = Settings.StorageSettings(
      provider = "aws", bucket = "lake", s3 = S3Config(region = Some("us-east-1"))))
    val store = CloudStorage.forSettings(aws, "raw/events")
    assert(store.rootUri == "s3a://lake/warehouse/raw/events")
    assert(store.config.exists(_.scheme == "s3a"))
    assert(store.uri("day=2024-01-01") == "s3a://lake/warehouse/raw/events/day=2024-01-01")
    // local provider: plain path, no hadoop config to apply
    val local = CloudStorage.forSettings(Settings.Root())
    assert(local.config.isEmpty && local.rootUri == "warehouse")
    assert(local.configureOn(spark).isEmpty)
    // missing bucket rejects loudly (the ConfigurationError contract)
    intercept[IllegalArgumentException](CloudStorage.forSettings(
      aws.copy(storage = aws.storage.copy(bucket = ""))))
    // azure needs its storage.azure section
    intercept[IllegalArgumentException](CloudStorage.forSettings(
      Settings.Root(storage = Settings.StorageSettings(provider = "azure", bucket = "c"))))
  }

  test("forLayer: medallion-layer store roots under the layer path (factory.py:82)") {
    import graft.sources.Settings
    val gcp = Settings.Root(storage = Settings.StorageSettings(provider = "gcp", bucket = "b"))
    assert(CloudStorage.forLayer(gcp, "bronze").rootUri == "gs://b/warehouse/bronze")
    assert(CloudStorage.forLayer(gcp, "gold").rootUri == "gs://b/warehouse/gold")
    intercept[IllegalArgumentException](CloudStorage.forLayer(gcp, "platinum"))
  }
}
