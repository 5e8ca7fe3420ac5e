package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.services.{Qa, Redaction}
import graft.sources.{Sinks, VersionedTable}

/** Bucketed writes (exchange-free co-located joins), SQL-registered
  * cosine_similarity, redaction verification.
  */
class SinksSpec extends SparkSpec {

  test("bucketed tables join without a shuffle on either side") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    Sinks.writeBucketed(facts, "bucketed_a", buckets = 4, bucketKeys = Seq("k"), sortKeys = Seq("k"))
    Sinks.writeBucketed(facts, "bucketed_b", buckets = 4, bucketKeys = Seq("k"), sortKeys = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L * 10) // 100 keys x 10 x 10 matches... per key
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("dynamic partition overwrite replaces only the batch's partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dyn").toString
    val day1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0)).toDF("dt", "id", "v")
    Sinks.writePartitionedIdempotent(day1, dir, Seq("dt"))
    // restatement of day 2 only — day 1 must survive untouched
    val day2fix = Seq(("2024-01-02", 2L, 99.0)).toDF("dt", "id", "v")
    Sinks.writePartitionedIdempotent(day2fix, dir, Seq("dt"))
    // partition-value inference types dt as DATE on read — compare as string
    val got = spark.read.parquet(dir).select(col("dt").cast("string"), col("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSet
    assert(got == Set("2024-01-01" -> 10.0, "2024-01-02" -> 99.0))
  }

  test("versioned table: failed audit publishes nothing; reader stays on previous version") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_vt").toString + "/tbl"
    val v1 = VersionedTable.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(v1 == 1)
    // audit gate rejects the second write mid-commit (after data files land)
    intercept[IllegalStateException] {
      VersionedTable.commit(spark, t, Seq((3L, "c")).toDF("id", "s"),
        audit = staged => if (staged.count() < 100) throw new IllegalStateException("too few rows"))
    }
    assert(VersionedTable.versions(spark, t) == Seq(1), "failed commit must not be visible")
    assert(VersionedTable.read(spark, t).count() == 2, "previous version must stay readable")
    // a marker-less directory (simulated crash between write and publish)
    // is invisible to readers and swept by vacuum
    val crashDir = new org.apache.hadoop.fs.Path(t, "v=00002")
    Seq((9L, "z")).toDF("id", "s").write.mode("overwrite").parquet(crashDir.toString)
    assert(VersionedTable.versions(spark, t) == Seq(1))
    val v3 = VersionedTable.commit(spark, t, Seq((3L, "c")).toDF("id", "s"))
    assert(VersionedTable.read(spark, t).count() == 1 && v3 == 3)
    VersionedTable.vacuum(spark, t, keep = 2)
    val fs = crashDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(crashDir), "vacuum must sweep dead staging directories")
  }

  test("versioned table: upsert/delete/time-travel/restore/vacuum semantics") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_vt2").toString + "/tbl"
    VersionedTable.commit(spark, t, Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v"))
    VersionedTable.upsert(spark, t,
      Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("id", "s", "v"), keys = Seq("id"))
    val afterUpsert = VersionedTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(afterUpsert.toSeq == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    VersionedTable.delete(spark, t, col("id") === 1L)
    assert(VersionedTable.read(spark, t).count() == 2)
    // time travel to v1, then restore it as the new head
    assert(VersionedTable.read(spark, t, asOf = Some(1)).count() == 2)
    val restored = VersionedTable.restore(spark, t, toVersion = 1)
    assert(restored == 4)
    assert(VersionedTable.read(spark, t).orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // vacuum expires old versions, current stays readable
    val expired = VersionedTable.vacuum(spark, t, keep = 1)
    assert(expired == Seq(1, 2, 3))
    assert(VersionedTable.versions(spark, t) == Seq(4))
    assert(VersionedTable.read(spark, t).count() == 2)
  }

  test("versioned table: append with a new column evolves the schema") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_vt3").toString + "/tbl"
    VersionedTable.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // iceberg tables.py:447 add_column, expressed as copy-on-write:
    // new rows carry the extra column, prior rows read back null for it
    VersionedTable.append(spark, t, Seq((2L, "b", 9.5)).toDF("id", "s", "score"))
    val cur = VersionedTable.read(spark, t)
    assert(cur.columns.toSeq.sorted == Seq("id", "s", "score"))
    val byId = cur.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).getDouble(byId(2L).fieldIndex("score")) == 9.5)
    // time travel still returns v1's own (pre-evolution) schema
    assert(VersionedTable.read(spark, t, Some(1)).columns.toSeq == Seq("id", "s"))
  }

  test("versioned table: compaction bin-packs small files and preserves data + history") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val t = java.nio.file.Files.createTempDirectory("graft_vt4").toString + "/tbl"
    // streaming-ingest shape: a snapshot fragmented into many tiny files
    val rows = (1L to 2000L).map(i => (i, i % 7, s"payload_$i")).toDF("id", "k", "s")
    VersionedTable.commit(spark, t, rows.repartition(32))
    def filesOf(v: Int): Seq[Path] = {
      val fsys = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.listStatus(new Path(t, f"v=$v%05d")).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).map(_.getPath)
    }
    assert(filesOf(1).size == 32)
    val v2 = VersionedTable.compact(spark, t, targetFileBytes = 1024L * 1024)
    assert(v2 == 2 && filesOf(2).size < 8) // 2000 tiny rows pack into few files
    // data identical, history intact, old fragmentation still time-travelable
    assert(VersionedTable.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 2000L))
    assert(filesOf(1).size == 32)
    // clustered compaction: range partitioning keeps each key's rows in
    // one file → a k-filter prunes to a subset of files via min/max
    val v3 = VersionedTable.compact(spark, t, targetFileBytes = 16L * 1024, clusterBy = Seq("k"))
    assert(v3 == 3)
    assert(VersionedTable.read(spark, t).filter(col("k") === 3).count() ==
      (1L to 2000L).count(_ % 7 == 3))
  }

  test("cosine_similarity is SQL-callable after registration") {
    CosineSimilarity.registerSql(spark)
    val v = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 0.6) < 1e-7)
  }

  test("redactionVerified: clean + tagged text passes, residual PII fails") {
    import spark.implicits._
    val pats = Redaction.CommonPatterns.filter(_.name == "email").flatMap(_.patterns)
    val df = Seq(
      ("mail [EMAIL] ok", true),
      ("mail a@b.com leaked", false),
      ("no pii no tag", false) // expected tag required below
    ).toDF("t", "expected")
    val out = df.select(
      Qa.redactionVerified(col("t"), pats, expectedTags = Seq("[EMAIL]")).as("ok"),
      col("expected")).collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }
}
