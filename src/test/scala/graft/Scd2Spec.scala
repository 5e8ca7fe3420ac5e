package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.medallion.Scd2

/** SCD2 semantics: initial load, two merges, point-in-time reads,
  * deletes (ref medallion/scd.py:53,335,397).
  */
class Scd2Spec extends SparkSpec {

  private def snap(rows: Seq[(Int, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "seg", "bal")
  }

  private val keys = Seq("id")
  private val tracked = Seq("seg", "bal")

  test("initial load marks everything current v1") {
    val t = Scd2.initialLoad(snap(Seq((1, "A", 10.0), (2, "B", 20.0))), keys, tracked, lit("2024-01-01"))
    assert(t.filter(col("_scd_is_current") && col("_scd_version") === 1).count() == 2)
    assert(t.filter(col("_scd_effective_to").isNotNull).count() == 0)
  }

  test("merge: insert, update, unchanged, delete") {
    val t1 = Scd2.initialLoad(snap(Seq((1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0))),
      keys, tracked, lit("2024-01-01"))
    // id=1 unchanged, id=2 updated, id=3 deleted, id=4 new
    val src = snap(Seq((1, "A", 10.0), (2, "B2", 21.0), (4, "D", 40.0)))
      .withColumn("_del", lit(false))
      .unionByName(snap(Seq((3, "C", 30.0))).withColumn("_del", lit(true)))
    val t2 = Scd2.merge(t1, src, keys, tracked, lit("2024-02-01"), Some("_del"))

    val byId = t2.collect().groupBy(_.getAs[Int]("id"))
    assert(byId(1).length == 1 && byId(1).head.getAs[Boolean]("_scd_is_current"))
    assert(byId(2).length == 2)
    val v2 = byId(2).find(_.getAs[Int]("_scd_version") == 2).get
    assert(v2.getAs[String]("seg") == "B2" && v2.getAs[Boolean]("_scd_is_current"))
    val v1 = byId(2).find(_.getAs[Int]("_scd_version") == 1).get
    assert(!v1.getAs[Boolean]("_scd_is_current") && v1.getAs[java.sql.Timestamp]("_scd_effective_to") != null)
    assert(byId(3).length == 1 && !byId(3).head.getAs[Boolean]("_scd_is_current"))
    assert(byId(4).length == 1 && byId(4).head.getAs[Int]("_scd_version") == 1)
  }

  test("point-in-time read returns the version effective at asOf") {
    val t1 = Scd2.initialLoad(snap(Seq((1, "A", 10.0))), keys, tracked, lit("2024-01-01"))
    val t2 = Scd2.merge(t1, snap(Seq((1, "A2", 11.0))), keys, tracked, lit("2024-02-01"))
    val t3 = Scd2.merge(t2, snap(Seq((1, "A3", 12.0))), keys, tracked, lit("2024-03-01"))

    def segAt(asOf: String): String =
      Scd2.recordsAt(t3, lit(asOf)).select("seg").collect().map(_.getString(0)).toSeq match {
        case Seq(one) => one
        case other    => fail(s"expected exactly one version at $asOf, got $other")
      }
    assert(segAt("2024-01-15") == "A")
    assert(segAt("2024-02-15") == "A2")
    assert(segAt("2024-12-31") == "A3")
    // exactly at a boundary the new version wins (from <= asOf < to)
    assert(segAt("2024-02-01") == "A2")
    assert(Scd2.recordsAt(t3, lit("2023-12-31")).count() == 0)
    assert(Scd2.history(t3, col("id") === 1).select("_scd_version")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("delete-then-reinsert continues the version sequence") {
    val t1 = Scd2.initialLoad(snap(Seq((1, "A", 10.0))), keys, tracked, lit("2024-01-01"))
    // soft-delete id=1
    val delSrc = snap(Seq((1, "A", 10.0))).withColumn("_del", lit(true))
    val t2 = Scd2.merge(t1, delSrc, keys, tracked, lit("2024-02-01"), Some("_del"))
    assert(t2.filter(col("_scd_is_current")).count() == 0)
    // revive id=1: must become version 2, not a duplicate (1, v1)
    val t3 = Scd2.merge(t2, snap(Seq((1, "A2", 11.0))), keys, tracked, lit("2024-03-01"))
    val rows = t3.filter(col("id") === 1).collect()
    assert(rows.map(_.getAs[Int]("_scd_version")).sorted.toSeq == Seq(1, 2),
      "versions must stay dense and unique across delete-then-revive")
    val revived = rows.find(_.getAs[Boolean]("_scd_is_current")).get
    assert(revived.getAs[Int]("_scd_version") == 2 && revived.getAs[String]("seg") == "A2")
  }

  test("re-merging an identical snapshot is a no-op") {
    val t1 = Scd2.initialLoad(snap(Seq((1, "A", 10.0), (2, "B", 20.0))), keys, tracked, lit("2024-01-01"))
    val t2 = Scd2.merge(t1, snap(Seq((1, "A", 10.0), (2, "B", 20.0))), keys, tracked, lit("2024-02-01"))
    assert(t2.count() == 2)
    assert(t2.filter(col("_scd_is_current") && col("_scd_version") === 1).count() == 2)
  }

  test("mergeIntoVersioned: transactional dimension updates with audit + time travel") {
    import graft.sources.VersionedTable
    val t = java.nio.file.Files.createTempDirectory("graft_scd_vt").toString + "/dim"
    VersionedTable.commit(spark, t,
      Scd2.initialLoad(snap(Seq((1, "A", 10.0), (2, "B", 20.0))), keys, tracked, lit("2024-01-01")))
    // balance change for id=1 -> new current version, old row closed
    val v2 = Scd2.mergeIntoVersioned(spark, t, snap(Seq((1, "A", 99.0), (2, "B", 20.0))),
      keys, tracked, lit("2024-02-01"))
    assert(v2 == 2)
    val cur = Scd2.currentRecords(VersionedTable.read(spark, t))
    assert(cur.count() == 2)
    assert(cur.filter(col("id") === 1).head().getAs[Double]("bal") == 99.0)
    // the pre-merge dimension remains time-travelable
    val before = Scd2.currentRecords(VersionedTable.read(spark, t, asOf = Some(1)))
    assert(before.filter(col("id") === 1).head().getAs[Double]("bal") == 10.0)
    // an audit-violating staged state publishes nothing: hand-corrupt a
    // merge result with two current rows for one key
    val corrupt = VersionedTable.read(spark, t)
      .unionByName(Scd2.currentRecords(VersionedTable.read(spark, t)).filter(col("id") === 1))
    intercept[IllegalArgumentException](
      VersionedTable.commit(spark, t, corrupt, audit = staged => {
        val dup = staged.filter(col("_scd_is_current"))
          .groupBy("id").count().filter(col("count") > 1).limit(1).count()
        require(dup == 0, "dup current")
      }))
    assert(VersionedTable.currentVersion(spark, t).contains(2), "failed audit must not publish")
  }
}
