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

  test("right/full outer joins are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(events, users, Seq("user_id"), 8, how = "full_outer")
    }
  }
}
