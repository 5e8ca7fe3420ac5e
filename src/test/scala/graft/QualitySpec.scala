package graft

import org.apache.spark.sql.functions._

import graft.validation.Quality

/** Profiling semantics (ref validation/quality.py:146,240,309). */
class QualitySpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (Some(1.0), Some("aa"), 1),
      (Some(2.0), Some("bbbb"), 1),
      (Some(3.0), None, 1),
      (None, Some("cc"), 1)
    ).toDF("x", "s", "const")
  }

  test("profile: one row per column with kind-specific stats") {
    val p = Quality.profile(df, Seq("x", "s", "const")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("x").getAs[String]("kind") == "numeric")
    assert(p("x").getAs[Long]("nulls") == 1)
    assert(p("x").getAs[Double]("mean_val") == 2.0)
    assert(math.abs(p("x").getAs[Double]("std_val") - 1.0) < 1e-9)
    assert(p("s").getAs[Long]("min_len") == 2 && p("s").getAs[Long]("max_len") == 4)
    assert(p("const").getAs[Boolean]("is_constant"))
  }

  test("profileApprox matches the exact profile within HLL error bounds") {
    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
    val exact = Quality.profile(li, cols).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Long]("unique")).toMap
    val approx = Quality.profileApprox(li, cols).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Long]("unique")).toMap
    cols.foreach { c =>
      val rel = math.abs(approx(c) - exact(c)).toDouble / math.max(exact(c), 1)
      assert(rel <= 0.05, s"$c: approx=${approx(c)} exact=${exact(c)} rel=$rel")
    }
  }

  test("profileApprox plans no Expand operator (the 100 TB path)") {
    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
    // The exact path's multiple count_distincts force Catalyst to plan an
    // Expand that replicates every input row per distinct group — a
    // (#distinct+1)× scan multiplier. The sketch path must not.
    val exactPlan = Quality.profile(li, cols).queryExecution.executedPlan.toString
    val approxPlan = Quality.profileApprox(li, cols).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact profile is expected to Expand (oracle path)")
    assert(!approxPlan.contains("Expand"), s"approx profile must not Expand:\n$approxPlan")
  }

  test("datasetQualityApprox tracks the exact scores and plans no Expand") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_returnflag")
    val exact = Quality.datasetQuality(li).collect().head
    val approx = Quality.datasetQualityApprox(li).collect().head
    assert(approx.getAs[Long]("row_count") == exact.getAs[Long]("row_count"))
    // duplicate estimate from a 64-bit row hash + HLL: within sketch error
    val dupRel = math.abs(approx.getAs[Long]("duplicate_rows") - exact.getAs[Long]("duplicate_rows")).toDouble /
      math.max(exact.getAs[Long]("row_count"), 1)
    assert(dupRel <= 0.05, s"duplicate_rows drifted: $approx vs $exact")
    assert(math.abs(approx.getAs[Double]("quality_score") - exact.getAs[Double]("quality_score")) <= 2.0)
    val exactPlan = Quality.datasetQuality(li).queryExecution.executedPlan.toString
    val approxPlan = Quality.datasetQualityApprox(li).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact datasetQuality is expected to Expand (oracle path)")
    assert(!approxPlan.contains("Expand"), s"approx datasetQuality must not Expand:\n$approxPlan")
  }

  test("compareProfilesApprox tracks exact drift and plans no Expand") {
    val o = Tables.orders(spark, sfDir)
    val cols = Seq("o_orderkey", "o_totalprice", "o_orderstatus")
    val shrunk = o.limit(500)
    val exact = Quality.compareProfiles(o, cols, shrunk, cols).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Double]("null_pct_diff")).toMap
    val approx = Quality.compareProfilesApprox(o, cols, shrunk, cols).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Double]("null_pct_diff")).toMap
    cols.foreach(c => assert(math.abs(approx(c) - exact(c)) < 1e-9)) // null drift is exact
    val plan = Quality.compareProfilesApprox(o, cols, shrunk, cols)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx drift must not Expand:\n$plan")
  }

  test("approx outliers track the exact fences within sketch tolerance") {
    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Quality.outliersIqr(li, cols).collect()
      .map(r => r.getAs[String]("column") -> (r.getAs[Double]("q1"), r.getAs[Double]("q3"))).toMap
    val approx = Quality.outliersIqr(li, cols, exact = false).collect()
      .map(r => r.getAs[String]("column") -> (r.getAs[Double]("q1"), r.getAs[Double]("q3"))).toMap
    cols.foreach { c =>
      val ((eq1, eq3), (aq1, aq3)) = (exact(c), approx(c))
      val spreadE = math.max(eq3 - eq1, 1e-9)
      assert(math.abs(aq1 - eq1) / spreadE < 0.05, s"$c q1: $aq1 vs $eq1")
      assert(math.abs(aq3 - eq3) / spreadE < 0.05, s"$c q3: $aq3 vs $eq3")
    }
  }

  test("outliersIqr flags values beyond the Tukey fences") {
    import spark.implicits._
    val d = (Seq.fill(20)(10.0) ++ Seq(1000.0)).toDF("v")
    val o = Quality.outliersIqr(d, Seq("v")).collect().head
    assert(o.getAs[Long]("n_outliers") == 1)
  }

  test("compareProfiles flags added/removed columns and null drift anomalies") {
    import spark.implicits._
    val before = Seq((1, Some("a")), (2, Some("b"))).toDF("id", "v")
    val after = Seq((1, None: Option[String], 1.0), (2, None, 2.0)).toDF("id", "v", "extra")
    val drift = Quality.compareProfiles(before, Seq("id", "v"), after, Seq("id", "v", "extra"))
    val byCol = drift.collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(byCol("extra").getAs[String]("status") == "added")
    assert(byCol("v").getAs[Double]("null_pct_diff") == 100.0)
    assert(byCol("id").getAs[Double]("null_pct_diff") == 0.0)
    val anomalies = Quality.detectAnomalies(drift).collect().map(_.getAs[String]("column")).toSet
    assert(anomalies == Set("extra", "v"))
  }

  test("datasetQuality counts duplicates and completeness") {
    import spark.implicits._
    val d = Seq((1, Some("a")), (1, Some("a")), (2, None)).toDF("id", "v")
    val q = Quality.datasetQuality(d).collect().head
    assert(q.getAs[Long]("duplicate_rows") == 1)
    assert(q.getAs[Long]("complete_rows") == 2)
    // 1 null cell of 6 total
    assert(math.abs(q.getAs[Double]("completeness_score") - 500.0 / 6) < 1e-9)
  }
}
