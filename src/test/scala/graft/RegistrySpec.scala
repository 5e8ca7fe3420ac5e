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
