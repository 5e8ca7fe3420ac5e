package graft

import java.nio.file.Files

/** Every SparkEntry query must survive EMPTY inputs — the first batch
  * of a new pipeline is empty, and an operator that throws on it takes
  * the whole DAG down. Executes each query against zero-row copies of
  * all tables (schemas preserved) and requires a result, not an
  * exception (empty or degenerate outputs are fine).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries run to completion on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries crashing on empty input:\n${failures.mkString("\n")}")
  }
}
