package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Z-order layout: Morton interleave math, per-chunk envelope
  * tightness (the property parquet footer pruning consumes), and the
  * one-shuffle plan shape. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("interleave computes Morton codes (hand-checked) and validates the bit budget") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit j of x → position 2j; bit j of y → position 2j+1
    // (3,5)=(011,101): x bits at 0,2 → 1+16=17... compute: x=3 → bits0,1 → pos0,2 → 1+4=5; y=5 → bits0,2 → pos1,5 → 2+32=34; z=39
    assert(rows == Seq(0L, 1L, 2L, 3L, 39L))
    intercept[IllegalArgumentException](
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 32)) // 64 > 63
  }

  test("normalize maps bounds to [0, 2^bits), nulls and constants to 0") {
    val df = Seq(Some(0.0), Some(50.0), Some(100.0), None).toDF("v")
      .select(ZOrder.normalize(col("v"), lit(0.0), lit(100.0), 8).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 128L, 255L, 0L))
    val const = Seq(7.0, 7.0).toDF("v")
      .select(ZOrder.normalize(col("v"), lit(7.0), lit(7.0), 8).as("n"))
    assert(const.collect().forall(_.getLong(0) == 0L))
  }

  test("z-order gives tight per-chunk envelopes in BOTH dimensions; single-column sort does not") {
    // a 64x64 grid: every (x, y) combination once
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))

    def avgSpan(df: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val spans = df.withColumn("_p", spark_partition_id())
        .groupBy("_p").agg((max(col(dim)) - min(col(dim))).as("span"))
        .agg(avg("span")).head().getDouble(0)
      spans
    }

    val k = 16
    val z = ZOrder.zOrderBy(grid, Seq("x", "y"), partitions = k, bits = 6)
    // single-column layout: perfect on x, useless on y
    val xOnly = grid.repartitionByRange(k, col("x")).sortWithinPartitions("x")

    val (zx, zy) = (avgSpan(z, "x"), avgSpan(z, "y"))
    val sy = avgSpan(xOnly, "y")
    // x-sort leaves y unconstrained (~full 63 span); z-order bounds both
    assert(sy > 55, s"x-sorted y-span should be ~63, got $sy")
    assert(zx < 32 && zy < 32, s"z-order spans should be tight, got x=$zx y=$zy")

    // The property footer pruning consumes: a narrow filter on the
    // NON-leading dimension. Count chunks whose [min,max] y-envelope
    // intersects y ∈ [8, 15]: x-sort must read every file (y spans the
    // full range everywhere); z-order skips the majority.
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("_p", spark_partition_id())
        .groupBy("_p").agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
        .filter(col("lo") <= 15 && col("hi") >= 8).count()
    assert(filesRead(xOnly) == k, "x-sorted layout cannot prune a y filter")
    assert(filesRead(z) <= k / 2,
      s"z-order should prune most files for a narrow y filter, read ${filesRead(z)}/$k")
  }

  test("zOrderBy is one range shuffle; the key column does not survive") {
    val grid = spark.range(100).select((col("id") % 10).as("x"), (col("id") / 10).as("y"))
    val z = ZOrder.zOrderBy(grid, Seq("x", "y"), partitions = 4)
    assert(z.columns.toSeq == Seq("x", "y"))
    val plan = z.queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).size == 1, plan)
    // content unchanged — layout only
    assert(z.count() == 100 && z.distinct().count() == 100)
  }
}
