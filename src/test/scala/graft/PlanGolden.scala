package graft

import org.apache.spark.sql.DataFrame

/** Golden-plan measurement shared by PlanShapeSpec (the assertions)
  * and the regeneration main (run after an INTENTIONAL plan change):
  *
  *   sbt "Test/runMain graft.PlanGolden"
  *
  * Two facets per query, both from the OPTIMIZED LOGICAL plan (stable
  * run-to-run, unlike the AQE physical plan):
  *   - skeleton: operator nodeNames in tree order — catches an
  *     operator-level regression (a lost pushdown collapsing into a
  *     different join/aggregate arrangement, a new Expand);
  *   - exprNodes: total expression-tree node count — catches the
  *     q117 CLASS of defect, where operators stay identical but an
  *     unmaterialized subtree is inlined N times and the expression
  *     forest silently explodes (q117's was ~6x).
  */
object PlanGolden {

  final case class Shape(skeleton: String, exprNodes: Int)

  def shape(df: DataFrame): Shape = {
    val plan = df.queryExecution.optimizedPlan
    val skeleton = plan.collect { case n => n.nodeName }.mkString(">")
    val exprNodes = plan.collect { case n =>
      n.expressions.map(e => e.collect { case _ => 1 }.sum).sum
    }.sum
    Shape(skeleton, exprNodes)
  }

  /** The queries worth pinning: the most expensive by BASELINE.md min
    * (everything ≥ ~1.5 s) + the corpus-scale round-7/8 additions. */
  val Pinned: Seq[String] = Seq(
    "q40_profile", "q40a_profile_approx", "q41_outliers", "q42a_dataset_quality_approx",
    "q43_profile_drift", "q43a_profile_drift_approx", "q92_dedup_minhash",
    "q93_dedup_simhash", "q94_dedup_ngram", "q96_knn_lsh", "q96a_knn_ivf",
    "q114_dedup_clusters", "q116_embed_neardup",
    "q116a_neardup_lsh", "q118_c4_filter", "q119_line_boilerplate", "q121_decontaminate",
    "q122_coverage", "q123_incremental_dedup", "q124_url_dedup",
    "q126_repeated_spans", "q126a_repeated_spans_fast", "q127_chunk",
    "q128_trim_contamination", "q129_lm_perplexity", "q130_dsir_select",
    "q131_tfidf_keywords", "q133_bigram_perplexity",
    "q140a_bpe_pair_counts", "q141_bpe_encode", "q142_epoch_mix", "q148_main_content",
    "q149_paragraph_dedup", "q150_incremental_paragraphs", "q151_pagerank",
    "q152_harmonic", "q156_bm25", "q157_url_frontier_filter", "q158_triangles",
    "q159_anchor_text", "q161_lpa_communities", "q163_containment",
    "q164_robots", "q165_ccnet_buckets", "q166_inverted_index",
    "q169_domain_stats_incremental", "q170_html_links",
    "q172_langid_learned", "q176_hits",
    "q180_corpus_pipeline", "q185_containment_banded", "q186_index_incremental",
    "q188_bm25_store", "q191_containment_dedup",
    // the warm/store graph family (r18 verdict #4): the same
    // iteration-loop lineage exposure q176's golden caught at 2,984
    // expression nodes
    "q187_pagerank_warm", "q192_hits_warm", "q193_lpa_warm",
    "q194_triangles_store", "q196_harmonic_store", "q198_hyperball_warm")

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    Pinned.foreach { name =>
      val s = shape(SparkEntry.queries(name)(spark, sfDir))
      println(s"""    "$name" -> Shape(""")
      println(s"""      "${s.skeleton}",""")
      println(s"""      ${s.exprNodes}),""")
    }
    spark.stop()
  }
}
