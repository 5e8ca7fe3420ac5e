package graft

import java.nio.file.Files

import graft.sources.Registry

/** Connector registry: by-name resolution, aliases, deployment
  * overrides, the unknown-name error contract, and end-to-end loads
  * for the file-format builtins (ref connectors/registry.py). */
class RegistrySpec extends SparkSpec {

  import spark.implicits._

  test("builtin names and aliases resolve; listConnectors is sorted") {
    for (n <- Seq("csv", "json", "parquet", "binary", "postgresql", "postgres",
        "mysql", "jdbc", "snowflake", "bigquery", "huggingface", "hf",
        "audio", "wav", "video", "pdf", "document", "docx", "word"))
      assert(Registry.get(n).isDefined, s"missing builtin: $n")
    assert(Registry.get("CSV").isDefined) // case-insensitive
    assert(Registry.listConnectors == Registry.listConnectors.sorted)
  }

  test("unknown name fails listing what IS available; missing option names the key") {
    val e = intercept[IllegalArgumentException](
      Registry.load("oracle_db", spark, Map.empty))
    assert(e.getMessage.startsWith("Unknown connector type: oracle_db. Available: "))
    assert(e.getMessage.contains("parquet"))
    val miss = intercept[IllegalArgumentException](
      Registry.load("parquet", spark, Map.empty))
    assert(miss.getMessage.contains("'path'"))
  }

  test("file-format builtins load end-to-end from options") {
    val dir = Files.createTempDirectory("graft-registry").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(s"$dir/p")
    assert(Registry.load("parquet", spark, Map("path" -> s"$dir/p")).count() == 2)

    Files.writeString(java.nio.file.Path.of(dir, "d.csv"), "id;name\n1;x\n2;y\n")
    val csv = Registry.load("csv", spark, Map("path" -> s"$dir/d.csv", "delimiter" -> ";"))
    assert(csv.columns.toSeq == Seq("id", "name") && csv.count() == 2)

    Files.writeString(java.nio.file.Path.of(dir, "d.json"), """{"id":1}""" + "\n" + """{"id":2}""")
    assert(Registry.load("json", spark, Map("path" -> s"$dir/d.json")).count() == 2)
  }

  test("settings root: defaults, flat-key round-trip, env expansion, typo rejection") {
    import graft.sources.Settings
    // defaults round-trip byte-for-byte through the flat map
    val dflt = Settings.Root()
    assert(Settings.fromMap(dflt.toMap, env = _ => None) == dflt)
    // a customized root (every section touched) round-trips too
    val custom = Settings.Root(
      lakehouse = Settings.LakehouseSettings("prod_lake", "wh"),
      storage = Settings.StorageSettings(provider = "azure", bucket = "data",
        azure = Some(graft.sources.CloudStorage.AzureConfig("acct", sasToken = Some("sv=1")))),
      medallion = Settings.MedallionSettings(
        bronze = Settings.LayerSettings("raw", Some(30), Seq("dt", "region"))),
      extraction = Settings.ExtractionSettings("full", 50000, 8, "modified_at", "2 hours"),
      connectors = Settings.ConnectorSettings(60, 5, 1.5),
      pipeline = Settings.PipelineSettings(2, checkpointEnabled = false))
    assert(Settings.fromMap(custom.toMap, env = _ => None) == custom)
    // sections render onto the existing typed configs + provider paths
    assert(custom.warehousePath == "abfss://data@acct.dfs.core.windows.net/wh")
    assert(custom.storage.activeConfig.get.toHadoopConf
      .exists(_._1.startsWith("fs.azure.sas")))
    assert(Settings.Root(storage = Settings.StorageSettings("aws", "b"))
      .warehousePath == "s3a://b/warehouse")
    assert(dflt.warehousePath == "warehouse") // local: bare path
    // ${VAR} / ${VAR:default} expansion, reference syntax
    val env = Map("BUCKET" -> "live-bucket")
    val expanded = Settings.fromMap(Map(
      "storage.provider" -> "aws",
      "storage.bucket" -> "${BUCKET}",
      "lakehouse.name" -> "${MISSING:fallback}",
      "lakehouse.warehouse" -> "${MISSING_NO_DEFAULT}"), env.get)
    assert(expanded.storage.bucket == "live-bucket")
    assert(expanded.lakehouse.name == "fallback")
    assert(expanded.lakehouse.warehouse == "${MISSING_NO_DEFAULT}") // stays literal
    // failures are loud and name the problem
    val typo = intercept[IllegalArgumentException](
      Settings.fromMap(Map("extraction.bachSize" -> "5"), env = _ => None))
    assert(typo.getMessage.contains("extraction.bachSize"))
    assert(intercept[IllegalArgumentException](Settings.fromMap(
      Map("extraction.batchSize" -> "lots"), env = _ => None))
      .getMessage.contains("not an int"))
    intercept[IllegalArgumentException](
      Settings.fromMap(Map("storage.provider" -> "ftp"), env = _ => None))
    // properties-file flavor
    val f = java.nio.file.Files.createTempFile("settings", ".properties")
    java.nio.file.Files.writeString(f,
      "storage.provider=gcp\nstorage.bucket=g\nstorage.gcs.projectId=p1\n")
    val fromFile = Settings.fromProperties(f.toString)
    assert(fromFile.warehousePath == "gs://g/warehouse")
    assert(fromFile.storage.activeConfig.get.toHadoopConf("fs.gs.project.id") == "p1")
  }

  test("register overrides builtins (later wins) and adds deployment connectors") {
    val marker = Seq(("custom", 1L)).toDF("source", "n")
    Registry.register("my_feed", (_, o) => { assert(o("token") == "t1"); marker })
    assert(Registry.load("my_feed", spark, Map("token" -> "t1")).collect()
      .head.getString(0) == "custom")
    // override then restore a builtin
    val original = Registry.get("json").get
    Registry.register("json", (_, _) => marker)
    assert(Registry.load("json", spark, Map.empty).columns.toSeq == Seq("source", "n"))
    Registry.register("json", original)
  }
}
