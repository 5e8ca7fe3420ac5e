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

  test("right/full outer joins are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(events, users, Seq("user_id"), 8, how = "full_outer")
    }
  }
}
