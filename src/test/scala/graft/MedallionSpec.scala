package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.medallion.{Gold, Silver}
import graft.medallion.Gold._

class MedallionSpec extends SparkSpec {

  test("Silver.clean trims and nullifies sentinel strings") {
    import spark.implicits._
    val df = Seq("  a  ", "N/A", "  ", "null", "ok").toDF("v")
    val out = Silver.clean(df).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("a"), None, None, None, Some("ok")))
  }

  test("Silver.normalizeColumnNames snake_cases") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("OrderKey", "custKey", "Total-Price")
    assert(Silver.normalizeColumnNames(df).columns.toSeq ==
      Seq("order_key", "cust_key", "total_price"))
  }

  test("Silver.dedup keeps the max-orderKey row per key") {
    import spark.implicits._
    val df = Seq((1, "a", 10, 1), (1, "a", 20, 2), (2, "b", 5, 3)).toDF("k1", "k2", "ts", "id")
    val out = Silver.dedup(df, Seq("k1", "k2"), struct(col("ts"), col("id")))
      .orderBy("k1").collect().toSeq
    assert(out == Seq(Row(1, "a", 20, 2), Row(2, "b", 5, 3)))
  }

  test("Silver.dedupWindow matches dedup semantics") {
    import spark.implicits._
    val df = Seq((1, "a", 10, 1), (1, "a", 20, 2), (2, "b", 5, 3)).toDF("k1", "k2", "ts", "id")
    val out = Silver.dedupWindow(df, Seq("k1", "k2"), Seq(col("ts").desc, col("id").desc))
      .orderBy("k1").collect().toSeq
    assert(out == Seq(Row(1, "a", 20, 2), Row(2, "b", 5, 3)))
  }

  test("Silver.process composes the full pipeline with metadata") {
    import spark.implicits._
    val df = Seq(
      ("1", " a ", "N/A", "2024-01-01 10:00:00"),
      ("1", " a ", "x", "2024-01-01 11:00:00"), // same key, later ts -> kept
      ("2", "b", "y", null)                     // null ts -> filtered
    ).toDF("ID", "Name", "note", "ts")
    val out = Silver.process(df,
      Silver.ProcessConfig(
        schemaMapping = Map("ID" -> "id", "Name" -> "name"),
        timestampColumns = Seq("ts"),
        requiredColumns = Seq("ts"),
        dedupKeys = Seq("id"),
        dedupOrderKey = Some(col("ts"))),
      sourceTable = "bronze.raw", processingTimeMs = 1704067200000L)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "a") // trimmed
    assert(rows.head.getAs[String]("note") == "x") // keep-last, N/A -> null on the dropped row
    assert(rows.head.getAs[String]("_source_table") == "bronze.raw")
    assert(out.columns.contains("_silver_processed_time"))
  }

  test("Silver.autoClean: stats-driven drops, median fills, dedup, actions, score") {
    import spark.implicits._
    val messy = Seq(
      (Some(10), "  a  ", "N/A"),
      (Some(20), "b", null),
      (None, "b", null), // numeric null → median fill
      (Some(20), "b", null), // dup of row 2 after trim/fill
      (Some(30), "c", "x"))
      .toDF("v", "name", "mostly_null")

    val r = graft.medallion.Silver.autoClean(messy, aggressive = true)
    // mostly_null is 80% null after N/A standardization → dropped
    assert(!r.data.columns.contains("mostly_null"))
    assert(r.actions.exists(_.contains("Dropped column 'mostly_null'")))
    // v's null filled with the (approx=exact here) median 20
    val vRows = r.data.select("v").collect()
    assert(vRows.forall(!_.isNullAt(0)))
    assert(vRows.map(_.getInt(0)).contains(20))
    assert(r.actions.exists(_.contains("Filled nulls in 'v' with median")))
    // trim made row 1 "a"; fill+dedup collapsed the duplicate
    assert(r.actions.exists(_.startsWith("Removed ")))
    assert(r.data.count() == 3) // (10,a) (20,b) (30,c)
    // fully complete and unique after cleaning → score 1.0
    assert(r.qualityScore == 1.0)

    // non-aggressive: column kept, remaining nulls lower completeness
    val gentle = graft.medallion.Silver.autoClean(messy)
    assert(gentle.data.columns.contains("mostly_null"))
    assert(gentle.qualityScore < 1.0 && gentle.qualityScore > 0.5)

    // empty input: no actions, neutral score, no crash
    val empty = graft.medallion.Silver.autoClean(messy.limit(0))
    assert(empty.actions.isEmpty && empty.qualityScore == 0.5)
  }

  test("Silver.fillNulls and filterInvalid") {
    import spark.implicits._
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None)).toDF("a", "b")
    assert(Silver.fillNulls(df, Map("a" -> 0)).filter(col("a") === 0).count() == 1)
    assert(Silver.filterInvalid(df, Seq("a", "b")).count() == 1)
  }

  test("Gold.aggregate computes grouped aggs with having") {
    import spark.implicits._
    val df = Seq(("x", 1.0), ("x", 3.0), ("y", 10.0)).toDF("g", "v")
    val out = Gold.aggregate(df, Seq("g"),
      Seq(Sum("v", "s"), CountAll("n"), Avg("v", "a")),
      having = Some(col("n") >= 2)).collect()
    assert(out.length == 1 && out(0).getAs[Double]("s") == 4.0)
  }

  test("Gold.topKPerGroup bounds rows per group deterministically") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("g", i)).toDF("g", "v")
    val out = Gold.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 3)
    assert(out.select("v").as[Int].collect().sorted.toSeq == Seq(8, 9, 10))
  }

  test("Gold.featureTable keeps entities with no facts at zero") {
    import spark.implicits._
    val ents = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val facts = Seq((1, 5.0), (1, 7.0)).toDF("eid", "v")
    val out = Gold.featureTable(ents, "id", facts, "eid",
      Seq(CountAll("n"), Sum("v", "s")), fillZero = Seq("n"))
    val m = out.collect().map(r => r.getAs[Int]("id") -> r.getAs[Long]("n")).toMap
    assert(m == Map(1 -> 2L, 2 -> 0L))
  }

  test("Gold.denormalize broadcast-joins dimensions") {
    import spark.implicits._
    val fact = Seq((1, 10), (2, 20)).toDF("fk", "v")
    val dim = Seq((1, "one")).toDF("dk", "label")
    val out = Gold.denormalize(fact, Seq(JoinDef(dim, Seq("fk"), Seq("dk"), "left")))
    assert(out.count() == 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("flattenStructs lifts nested structs to separator-joined columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, ("ada", (10, "nl")), Seq(1, 2))).toDF("id", "user", "tags")
      .select(col("id"),
        col("user").cast("struct<name:string,geo:struct<zip:int,cc:string>>").as("user"),
        col("tags"))
    val flat = graft.medallion.Silver.flattenStructs(df)
    assert(flat.columns.toSeq == Seq("id", "user_name", "user_geo_zip", "user_geo_cc", "tags"))
    val r = flat.head()
    assert(r.getString(1) == "ada" && r.getInt(2) == 10 && r.getString(3) == "nl")
    assert(r.getSeq[Int](4) == Seq(1, 2), "arrays stay as values")
    // idempotent on an already-flat frame
    assert(graft.medallion.Silver.flattenStructs(flat).columns.toSeq == flat.columns.toSeq)
  }
}
