package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection entry point: print the formatted physical plan (and
  * optionally run) any `SparkEntry.queries` entry. The bench gate's
  * companion — when a query's time moves, this is how the plan diff
  * gets read. Usage: graft.Explain <queryName> [sfDir] [run] */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query> [sfDir] [run]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("run")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // second run shows steady-state (post-JIT, page-cache-warm) cost
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name re-ran in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
