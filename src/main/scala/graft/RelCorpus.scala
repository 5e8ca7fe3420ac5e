package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× (sf1-equivalent) twin of the driver's relational
  * fixtures — the SECOND DECADE for the relational growth gate (r16
  * verdict #7): the r16 relational rows spanned one decade
  * (sf0.01 → sf0.1), the same two-points-define-a-line critique the
  * docs fleet's xl tier fixed, so the heaviest relational families get
  * a third point generated HERE (the driver's testdata is read-only
  * and ships no sf1).
  *
  * Construction: `factor` DISJOINT REPLICA UNIVERSES of the source
  * tables — every surrogate key k maps to k·factor + rep for
  * rep ∈ [0, factor), applied consistently to primary AND foreign
  * keys, so each universe is an exact copy of the original join graph:
  * referential integrity, per-key group sizes, join selectivities,
  * null/violation rates and every non-key column distribution are
  * preserved EXACTLY while row counts scale by `factor` — the property
  * a plan-shape gate needs (a skew or fan-out artifact of synthesis
  * would show up as a growth bend the CODE didn't cause). Fixed dims
  * (region, nation) copy unchanged, like TPC-H itself. Deterministic
  * by construction: no RNG anywhere (the ZipfCorpus discipline).
  *
  * Non-goal: distinct-value growth in non-key columns (names, dates
  * replicate). The gated queries' work terms scale with ROWS — scans,
  * Expand multiplicity, window partitions (keyed by replicated keys:
  * 10× partitions of unchanged size), join probe volume — not with
  * distinct payload values; profile-style distinct AGGREGATES stay
  * group-bounded either way.
  */
object RelCorpus {

  /** table → the BIGINT surrogate key columns remapped per replica
    * (primary and foreign together — consistency is what keeps every
    * universe's join graph intact). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"))

  private val copied = Seq("region", "nation")

  def generate(spark: SparkSession, srcDir: String, outDir: String, factor: Int = 10): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val reps = spark.range(factor).toDF("_rep")
    for ((table, keys) <- keyCols.toSeq.sortBy(_._1)) {
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val cols = src.columns.map { c =>
        if (keys.contains(c)) (col(c) * factor + col("_rep")).as(c) else col(c)
      }
      src.crossJoin(broadcast(reps)).select(cols.toIndexedSeq: _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$table.parquet")
    }
    for (table <- copied)
      spark.read.parquet(s"$srcDir/$table.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$table.parquet")
  }

  /** args: outDir [srcDir] [factor] */
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/rel10x")
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor)
    spark.stop()
  }
}
