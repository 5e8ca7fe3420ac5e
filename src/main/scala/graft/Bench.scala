package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Single-trial timings on a shared box swing 2-7x run-over-run (GC,
    // page cache, JIT); every query runs `trials` times and the MEDIAN is
    // reported so regressions are attributable to code, not the machine.
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/session warm-up outside the timed region so the first timed
    // query doesn't absorb classloading + codegen compilation cost.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=q41_outliers,q114_dedup_clusters. Unset = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    var failed = List.empty[String]
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // noop-format write forces FULL evaluation of every column (a
        // count() would let Catalyst prune all projections); failures are
        // recorded as -1 and listed, never disguised as fast queries.
        val times = (1 to trials).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None
          }
        }
        if (times.isEmpty) failed ::= name
        name -> (if (times.nonEmpty) (median(times), times.min, times.max)
                 else (-1.0, -1.0, -1.0))
      }
    // Times print with limited precision so the primary stdout line stays
    // small: the round-4 driver captured only the TAIL of stdout, and one
    // giant line with full-precision doubles + minmax pushed the medians
    // out of the capture window ("parsed": null). The compact line below
    // (~1.5 KB: medians + errors only) is what the gate parses; the full
    // detail (min/max spreads) goes to target/bench.json, which survives
    // regardless of how stdout is captured.
    def f(d: Double): String = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (m, _, _)) => "\"" + k + "\":" + f(m) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (_, lo, hi)) =>
      "\"" + k + "\":[" + f(lo) + "," + f(hi) + "]"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, (m, _, _)) if m >= 0 => m }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${f(total)},"unit":"sec","trials":$trials,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${f(total)},"unit":"sec","trials":$trials,"queries":$qs,"minmax":$spread,"errors":$errs,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    println(compact)
    spark.stop()
  }
}
