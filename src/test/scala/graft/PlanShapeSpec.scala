package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over EVERY SparkEntry query: catches the
  * scale anti-patterns the optimizer can't save you from — accidental
  * cartesian products, unbounded nested-loop joins, and scans that
  * lost their filter pushdown.
  */
class PlanShapeSpec extends SparkSpec {

  // Queries whose plans legitimately contain a broadcast nested-loop
  // join: an intentional crossJoin(broadcast(tiny)) — q41's 1-row
  // bounds, q60's 1-row × 1-row report join, q95's small query set,
  // q91's distinct-bitmask all-pairs (tiny-vocab fast path: the cross
  // side is the deduplicated mask set, bounded by min(2^vocab, #docs)).
  // Everything else must join on keys.
  // q116's exact all-pairs cosine is the oracle baseline for the
  // LSH-bucketed production path (Ann.cosineNearDupLsh) — same
  // division of labor as q91 vs q92.
  private val intentionalCross =
    Set("q41_outliers", "q41a_outliers_approx", "q60_qa_compare", "q95_knn_brute",
      "q91_dedup_jaccard", "q116_embed_neardup")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.executedPlan.toString
    }

  test("no query plan contains a cartesian product") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins only where a broadcast cross join is intended") {
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !intentionalCross(n) => n
    }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("watermark/filter queries push predicates into the parquet scan") {
    // queries whose defining predicate is scan-pushable
    for (q <- Seq("q70_incremental", "q01_gold_agg", "q02_gold_denorm")) {
      val pushed = plans(q).linesIterator.exists(l =>
        l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
      assert(pushed, s"$q lost filter pushdown:\n${plans(q)}")
    }
  }

  test("scans read only referenced columns (projection pruning)") {
    // q05 touches 3 of orders' 6 columns; the scan schema must not
    // contain the untouched ones
    val scanLine = plans("q05_gold_topk_window").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanLine.contains("o_orderpriority") && !scanLine.contains("o_orderstatus"),
      s"q05 reads unreferenced columns: $scanLine")
  }

  // NOTE: no blanket whole-stage-codegen assertion here — under AQE the
  // pre-execution plan string hides codegen stage markers. The hot-path
  // codegen guarantee that matters (CosineSimilarity) is asserted
  // directly in SimilaritySpec against a materialized plan.
}
