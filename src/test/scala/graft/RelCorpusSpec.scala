package graft

import org.apache.spark.sql.functions._

/** Pins the RelCorpus replica-universe invariants on the sf0.001
  * fixture: the 10×-twin gate only means something if the synthetic
  * tier preserves the source's join graph and group geometry EXACTLY —
  * a fan-out or skew artifact of generation would read as a growth
  * bend the code didn't cause. */
class RelCorpusSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_relx").toString
    RelCorpus.generate(spark, src, dir, factor = 3)
    dir
  }

  test("row counts scale by the factor; fixed dims copy unchanged") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ==
        3 * spark.read.parquet(s"$src/$t.parquet").count(), t)
    for (t <- Seq("region", "nation"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ==
        spark.read.parquet(s"$src/$t.parquet").count(), t)
  }

  test("join graph preserved: matched and orphan volumes both scale exactly, per-key group sizes unchanged") {
    def li(d: String) = spark.read.parquet(s"$d/lineitem.parquet")
    def ord(d: String) = spark.read.parquet(s"$d/orders.parquet")
    // inner-join volume scales by the factor (each universe replays
    // the original join graph verbatim)
    val srcJoin = li(src).join(ord(src), col("l_orderkey") === col("o_orderkey")).count()
    val outJoin = li(out).join(ord(out), col("l_orderkey") === col("o_orderkey")).count()
    assert(outJoin == 3 * srcJoin)
    // orphans (lineitems whose order is absent — the fixture's
    // violation rate) scale identically: integrity is neither repaired
    // nor broken by replication
    def orphans(d: String) = li(d).join(ord(d),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans(out) == 3 * orphans(src))
    // per-key group geometry: the multiset of orders-per-customer
    // group sizes replicates (every source group appears factor times,
    // never merged, never split) — windows see 3x partitions of
    // UNCHANGED size
    def groupSizes(d: String) = ord(d).groupBy("o_custkey").count()
      .groupBy("count").agg(count(lit(1)).as("n_groups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = groupSizes(src)
    assert(groupSizes(out) == s.map { case (sz, n) => sz -> 3 * n })
  }

  test("replica keys are disjoint and reversible: k*factor+rep never collides across universes") {
    val keys = spark.read.parquet(s"$out/customer.parquet").select("c_custkey")
    assert(keys.distinct().count() == keys.count())
    // every key decodes to a source key under div/mod
    val srcKeys = spark.read.parquet(s"$src/customer.parquet")
      .select(col("c_custkey").as("k")).distinct()
    val unmatched = keys.select(expr("c_custkey div 3").as("k")).distinct()
      .join(srcKeys, Seq("k"), "left_anti").count()
    assert(unmatched == 0L)
  }
}
