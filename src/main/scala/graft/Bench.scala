package graft
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Single-trial timings on a shared box swing 2-7x run-over-run (GC,
    // page cache, JIT, host phases); every query runs `trials` times as
    // interleaved rounds and the MINIMUM is reported so regressions are
    // attributable to code, not the machine.
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "4").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=q41_outliers,q114_dedup_clusters. Unset = all.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // BASELINE hygiene gate: every benched query must carry a row in
    // BASELINE.md (the 2x perf gate has no teeth for a query it has no
    // number for — q117 ran unbaselined for two rounds at 212 s). Fail
    // LOUD, before any timing, so a new query cannot land without its
    // baseline row in the same commit.
    val baselinePath = java.nio.file.Paths.get("BASELINE.md")
    if (java.nio.file.Files.exists(baselinePath)) {
      // explicit UTF-8: the doc has non-ASCII prose and a bare `java`
      // launch may default to a POSIX-locale ASCII charset
      val baselined = java.nio.file.Files
        .readAllLines(baselinePath, java.nio.charset.StandardCharsets.UTF_8)
        .asScala
        .collect { case l if l.startsWith("| q") => l.split("\\|")(1).trim }.toSet
      val missing = queries.map(_._1).filterNot(baselined)
      if (missing.nonEmpty) {
        System.err.println(
          s"[bench] FATAL: queries with no BASELINE.md row: ${missing.mkString(", ")} — " +
            "add a baseline row in the same commit as the query.")
        sys.exit(1)
      }
    }
    // Trial scheme (round 5 — the q21/q31 cross-run mystery): a long
    // shared-JVM run develops PHASE states — JIT compile backlog, code
    // cache churn, GC geometry — that make some sub-second query
    // consistently 3-5x slower for a stretch of one run and fast in the
    // next (observed: q21 tight at ~2.0s in one full run and 0.37s in
    // another, q31 the inverse — identical code, identical plans). Two
    // countermeasures, both about MEASUREMENT not execution:
    //  1. a full untimed WARM-UP pass compiles every query's codegen
    //     before any timing starts (no query's sample is dominated by
    //     its own first-compilation);
    //  2. trials run as INTERLEAVED ROUNDS (q1..qN, repeat) rather than
    //     back-to-back, so the three samples of a query come from three
    //     different epochs of the JVM — a transient degraded phase
    //     poisons at most one sample and the median discards it.
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures re-surface in timed rounds
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // This box is a VM on a shared host: phases of CPU steal make whole
    // minutes 2-5x slower regardless of what Spark does. Steal jiffies
    // from /proc/stat are sampled per round so a slow round is
    // ATTRIBUTABLE (high round_steal_pct = host contention, not a
    // regression) — the gate should never again argue about a number
    // the environment produced.
    def stealTotal(): (Long, Long) =
      try {
        val parts = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        (if (parts.length > 7) parts(7) else 0L, parts.sum)
      } catch { case _: Throwable => (0L, 0L) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val roundSteal = Seq.newBuilder[Double]
    for (_ <- 1 to trials) {
      val (s0, t0all) = stealTotal()
      for ((name, fn) <- queries) {
        // noop-format write forces FULL evaluation of every column (a
        // count() would let Catalyst prune all projections); failures are
        // recorded as -1 and listed, never disguised as fast queries.
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples.getOrElse(name, Nil)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
      val (s1, t1all) = stealTotal()
      roundSteal += (if (t1all > t0all) (s1 - s0) * 100.0 / (t1all - t0all) else 0.0)
    }
    // Primary per-query statistic: the MINIMUM across interleaved
    // rounds. Timing noise on this host is ONE-SIDED (phases of
    // multi-minute 3-20x slowdown with near-zero steal — likely host
    // memory-bandwidth/throttling, measured in BENCHMARKS.md round 5)
    // and can poison 2 of 3 rounds at once, which defeats a median;
    // the fastest observed run is the best estimator of what the code
    // costs. Median and max stay in the minmax detail for spread
    // reading.
    var failed = List.empty[String]
    val results = queries.map { case (name, _) =>
      val times = samples.getOrElse(name, Nil)
      if (times.isEmpty) failed ::= name
      name -> (if (times.nonEmpty) (times.min, median(times), times.max)
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
    val spread = results.map { case (k, (_, med, hi)) =>
      "\"" + k + "\":[" + f(med) + "," + f(hi) + "]"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, (m, _, _)) if m >= 0 => m }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val steal = roundSteal.result().map(f).mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${f(total)},"unit":"sec","trials":$trials,"queries":$qs,"errors":$errs,"round_steal_pct":$steal,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${f(total)},"unit":"sec","trials":$trials,"queries":$qs,"medmax":$spread,"errors":$errs,"round_steal_pct":$steal,"sf":"$sfDir"}"""
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    println(compact)
    spark.stop()
  }
}
