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
      "q91_dedup_jaccard", "q116_embed_neardup",
      // q156/q188: the SINGLE-ROW corpus-stats frame (n_docs, sum_dl)
      // broadcast-crossed into the scored frame — 1 row by
      // construction, never a data-sized cross
      "q156_bm25", "q188_bm25_store",
      // q168: the g1 < g2 SOURCE-pair join — both sides are the
      // distinct group list (bounded source/dump count, k-row
      // sketches), never corpus rows
      "q168_corpus_overlap",
      // q176/q192: the HITS L1 totals — SINGLE-ROW aggregates
      // broadcast-crossed into the score frames for the renormalizing
      // division (LinkGraph.scala hits/hitsFromStore crossJoin(
      // broadcast(aTot/hTot))), 1 row by construction, never a
      // data-sized cross; q192 is the store-fed/warm-start variant
      // running the same half-step shape
      "q176_hits", "q192_hits_warm",
      // q199: censusBounds' |fracs|-row frame (2 rows) inequality-
      // joined against the RANGE-bounded census, and the 1-row bounds
      // aggregate crossed back in censusLabeled — both bounded by
      // construction, never corpus rows
      "q199_quantile_census",
      // q40/q42/q43 (r20): the exact-profile moments × distincts split
      // — two 1-ROW aggregate frames cross-joined so the Expand the
      // count_distincts plan never carries the moment buffers
      // (Quality.profileWith splitDistincts); 1 row × 1 row by
      // construction
      "q40_profile", "q42_dataset_quality", "q43_profile_drift")

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

  // ---- golden plan snapshots (the 10 most expensive queries + q93) ----
  //
  // Two facets of the optimized logical plan are pinned (see
  // PlanGolden): the operator skeleton exactly, and the expression-
  // forest size against a 1.5x ceiling — the q117 defect class kept
  // the skeleton IDENTICAL while inlining an unmaterialized subtree
  // ~6x, so only the expression count sees it. After an INTENTIONAL
  // plan change, regenerate with: sbt "Test/runMain graft.PlanGolden"
  private val golden = Map(
    "q40_profile" -> PlanGolden.Shape(
      "Project>Generate>Join>Aggregate>Union>Project>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Aggregate>Expand>Union>Project>LogicalRelation>Project>Filter>LogicalRelation",
      977),
    "q40a_profile_approx" -> PlanGolden.Shape(
      "Project>Generate>Aggregate>Union>Project>LogicalRelation>Project>Filter>LogicalRelation",
      814),
    "q41_outliers" -> PlanGolden.Shape(
      "Project>Generate>Aggregate>Join>Project>LogicalRelation>Project>Aggregate>Project>LogicalRelation",
      351),
    "q42a_dataset_quality_approx" -> PlanGolden.Shape(
      "Project>Aggregate>Union>Project>LogicalRelation>Project>Filter>LogicalRelation",
      365),
    "q43_profile_drift" -> PlanGolden.Shape(
      "Project>Join>Project>Generate>Join>Aggregate>Project>LogicalRelation>Aggregate>Aggregate>Expand>Project>LogicalRelation>Project>Generate>Join>Aggregate>Union>Project>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Aggregate>Expand>Union>Project>LogicalRelation>Project>Filter>LogicalRelation",
      1693),
    "q43a_profile_drift_approx" -> PlanGolden.Shape(
      "Project>Join>Project>Generate>Aggregate>Project>LogicalRelation>Project>Generate>Aggregate>Union>Project>LogicalRelation>Project>Filter>LogicalRelation",
      1456),
    "q92_dedup_minhash" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Aggregate>Project>Join>Project>Join>Aggregate>Project>Join>Project>Generate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Project>Generate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD",
      678),
    // LogicalRDD = the sigs localCheckpoint: the fingerprint lineage
    // would otherwise plan on BOTH sides of the band self-join, and
    // the broadcast side's exchange can never ReusedExchange-collapse
    // against the shuffle side (it did before the checkpoint: 3652
    // expression nodes, the whole 64-agg pipeline twice)
    "q93_dedup_simhash" -> PlanGolden.Shape(
      "Aggregate>Project>Join>Project>Generate>Filter>LogicalRDD>Project>Generate>Filter>LogicalRDD",
      140),
    // LogicalRDD nodes = the deliberate localCheckpoint lineage cuts
    "q94_dedup_ngram" -> PlanGolden.Shape(
      "Project>Filter>Aggregate>Project>Join>Project>Filter>Generate>Project>Join>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Project>Join>Filter>LogicalRDD>Filter>Aggregate>Project>Filter>LogicalRDD",
      157),
    // sf0.001 takes the ≤4M-edge driver union-find branch:
    // LocalRelation is the broadcast label rejoin
    "q114_dedup_clusters" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>LocalRelation",
      18),
    "q116_embed_neardup" -> PlanGolden.Shape(
      "Project>Join>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation",
      37),
    // the three projection boundaries are the q117 discipline: text →
    // struct → fields, each alias multiply-referenced
    "q118_c4_filter" -> PlanGolden.Shape(
      "Project>Project>Project>LogicalRelation",
      226),
    // r8: hot/cold skew routing (hot broadcast join + anti-join + cold
    // shuffle join, unioned) + the empty-doc left rejoin — the skeleton
    // carries the whole differentiated-join shape
    "q119_line_boilerplate" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Aggregate>Union>Project>Join>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Filter>Aggregate>Aggregate>Project>Generate>Project>LogicalRelation>Project>Join>Aggregate>Project>Join>Generate>Project>Filter>LogicalRelation>Project>Filter>Aggregate>Aggregate>Project>Generate>Project>LogicalRelation>Filter>Aggregate>Aggregate>Project>Generate>Project>LogicalRelation",
      293),
    // r11 lean knnLsh: bucket join + candidate dedup move ids only;
    // the last two LogicalRelation subtrees are the vector re-attach
    // joins feeding the verify cosine + top-k window
    "q96_knn_lsh" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Project>Join>Project>Join>Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Project>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation",
      153),
    // r11: NO Aggregate between the cluster join and the top-k window —
    // the (query, neighbor) pair-dedup shuffle is provably redundant
    // (one IVF cell per corpus vector); its reappearance here is the
    // regression this snapshot exists to catch
    "q96a_knn_ivf" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Project>Join>Project>Filter>LogicalRelation>Project>Generate>Project>Filter>LogicalRelation",
      325),
    // LogicalRDD nodes = the banded-signature checkpoint; r11 LEAN
    // shape: the two LogicalRelation subtrees are the id-keyed vector
    // re-attach joins for the verify step — signatures move (id, band,
    // sig) only, vectors never ride the band explode or the pair dedup
    "q116a_neardup_lsh" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Aggregate>Project>Join>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation",
      78),
    // LogicalRDDs = the batch-signature + fixture-store checkpoints;
    // the three Unions are the (old-anti-new ∪ new) store appearing on
    // the band probe and both estimate sides
    "q123_incremental_dedup" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Aggregate>Project>Join>Project>Generate>LogicalRDD>Project>Generate>Union>Join>LogicalRDD>Project>Filter>LogicalRDD>LogicalRDD>Union>Project>Join>LogicalRDD>Project>Filter>LogicalRDD>Project>LogicalRDD>Union>Project>Join>LogicalRDD>Project>Filter>LogicalRDD>Project>LogicalRDD",
      828),
    // one narrow projection chain into one hash aggregate — URL
    // canonicalization must never grow a join or a second scan
    "q124_url_dedup" -> PlanGolden.Shape(
      "Aggregate>Project>Project>LogicalRelation",
      241),
    "q121_decontaminate" -> PlanGolden.Shape(
      "Project>Join>Project>Filter>LogicalRelation>Aggregate>Project>Join>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>Filter>LogicalRelation",
      88),
    // LogicalRDDs = the eager gram checkpoint (the five-consumer
    // lineage: counts aggregate + hotColdJoin's three probe legs);
    // the Union carries the hot-broadcast/cold-shuffle differentiated
    // join, the leading Join is the never-dropped-docs left rejoin
    "q126_repeated_spans" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Project>Aggregate>Union>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>Filter>LogicalRDD>Project>Join>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>Filter>LogicalRDD>Project>Filter>Aggregate>Project>Filter>LogicalRDD",
      234),
    // one Generate per side (train grams, eval grams), the eval side
    // collapsing through its distinct Aggregate into the broadcast
    // probe — no checkpoint (single consumer), no corpus-gram shuffle
    "q128_trim_contamination" -> PlanGolden.Shape(
      "Project>Project>Join>Project>Project>Filter>LogicalRelation>Aggregate>Project>Join>Project>Filter>Generate>Project>Project>Filter>LogicalRelation>Aggregate>Project>Filter>Generate>Project>Project>Filter>LogicalRelation",
      406),
    // the fast path's only skeleton delta: no null-guard Filter above
    // the checkpoint legs (xxhash64 over token columns is
    // non-nullable where conv(substr(md5)) is not)
    "q126a_repeated_spans_fast" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Project>Aggregate>Union>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Project>Join>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD",
      222),
    // chunking must stay one narrow Generate chain — no join, no
    // aggregate, no second scan
    "q127_chunk" -> PlanGolden.Shape(
      "Project>Generate>Project>Project>Filter>LogicalRelation",
      99),
    "q122_coverage" -> PlanGolden.Shape(
      "Project>Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Filter>Aggregate>Generate>Project>Filter>LogicalRelation",
      92),
    // LM scoring: one Generate per side (score tokens, model tokens),
    // one broadcast join, ONE Aggregate on the doc id — the micro-nat
    // arithmetic must stay in the post-join Project, not multiply
    // into per-field copies
    "q129_lm_perplexity" -> PlanGolden.Shape(
      "Project>Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>Filter>LogicalRelation",
      129),
    // DSIR: GlobalLimit>LocalLimit>Sort is TakeOrdered (per-partition
    // top-k, only k rows move — never a full global sort), and the two
    // vocab-bounded models merge BEFORE the token-stream join so the
    // corpus tokens are joined exactly once
    "q130_dsir_select" -> PlanGolden.Shape(
      "GlobalLimit>LocalLimit>Project>Sort>Aggregate>Project>Join>Project>Generate>Project>LogicalRelation>Project>Filter>Join>Aggregate>Generate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>LogicalRelation",
      117),
    // tf·idf: WindowGroupLimit = Spark's rank-limit pushdown (each
    // partition keeps its local top-k before the window sorts) — if
    // this node disappears the per-doc rank went global
    "q131_tfidf_keywords" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Project>Join>Aggregate>Project>Generate>Project>LogicalRelation>Aggregate>Generate>Project>LogicalRelation",
      94),
    // bigram perplexity: three LEFT joins (bigram, context, unigram) +
    // ONE doc-id Aggregate; the bigram/context sides must remain
    // shuffle-join-capable (no broadcast REQUIREMENT in the logical
    // plan — they are not vocab-bounded at corpus scale)
    "q133_bigram_perplexity" -> PlanGolden.Shape(
      "Project>Aggregate>Project>Join>Project>Join>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Project>Filter>Generate>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Filter>Generate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>Filter>LogicalRelation",
      317),
    // BPE training kernel: word-count aggregate feeding the pair
    // explode + pair aggregate — two shuffles, both vocab-keyed; a
    // third Aggregate or a Join appearing means the kernel stopped
    // being a pure two-level aggregation
    "q140a_bpe_pair_counts" -> PlanGolden.Shape(
      "Aggregate>Project>Generate>Aggregate>Generate>Project>LogicalRelation",
      100),
    // BPE encode: per-doc aggregate over the word-keyed JOIN of the
    // occurrence explode with the distinct-word (vocab) leg — exactly
    // one Join; the encode UDF must stay on the vocab side (inside the
    // right Aggregate leg), never per-occurrence
    "q141_bpe_encode" -> PlanGolden.Shape(
      "Aggregate>Project>Join>Generate>Project>LogicalRelation>Aggregate>Generate>Project>LogicalRelation",
      41),
    // epoch mix materialization: pure narrow — epoch Generate + hash
    // Filter over the scan, NO Join and NO extra Aggregate (the token
    // census is the offline plan-build step, not in this plan); any
    // Join/Exchange here is the 100 TB regression
    "q142_epoch_mix" -> PlanGolden.Shape(
      "Project>Filter>Generate>Project>Filter>LogicalRelation",
      77),
    // boilerplate removal: three narrow projections over one scan —
    // NO Exchange, Join, Generate, or Aggregate anywhere (the whole
    // extraction is higher-order array algebra per row); any of those
    // appearing is the 100 TB regression (an explode-based rewrite
    // would shuffle page text)
    "q148_main_content" -> PlanGolden.Shape(
      "Project>Project>Project>LogicalRelation",
      302),
    // paragraph dedup: keeper Aggregate (map-side partials collapse
    // hot paragraphs) feeding ONE equi-join back onto the explode —
    // the join key contains row-unique (id, pos) so no hot-key
    // reducer, and reassembly is the outer Aggregate (array_sort in
    // row), NO window/sort; a Window or second Join appearing is the
    // 100 TB regression
    "q149_paragraph_dedup" -> PlanGolden.Shape(
      "Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Project>Filter>Aggregate>Project>Generate>Project>LogicalRelation",
      167),
    "q150_incremental_paragraphs" -> PlanGolden.Shape(
      "Aggregate>Project>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Join>Project>Filter>Aggregate>Project>Filter>Generate>Project>Filter>LogicalRelation>Filter>LogicalRDD",
      237),
    "q151_pagerank" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Aggregate>Project>Join>Project>Join>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Project>Join>Project>Join>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Project>Join>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Project>Generate>Project>Filter>LogicalRelation",
      326),
    "q152_harmonic" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Aggregate>Union>Project>LogicalRDD>Project>LogicalRDD>Project>LogicalRDD",
      40),
    // BM25: the WindowGroupLimit under the top-k Window IS the scale
    // contract (per-partition top-k heaps before the exchange); the
    // probe derivation's Sort+limit is the vocab-bounded rank; losing
    // WindowGroupLimit or gaining a corpus-wide Join is the regression
    "q156_bm25" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Aggregate>Project>Join>Project>Join>Project>Join>Aggregate>Generate>Project>Project>Filter>LogicalRelation>Aggregate>Aggregate>Generate>Project>Project>Filter>LogicalRelation>Project>Filter>Window>GlobalLimit>LocalLimit>Sort>Aggregate>Generate>Project>LogicalRelation>Aggregate>Project>LogicalRelation",
      348),
    // one narrow projection chain + ONE Window partitioned by domain;
    // a second Window or a Join appearing is the regression
    "q157_url_frontier_filter" -> PlanGolden.Shape(
      "Project>Project>Window>Project>Project>Project>Project>LogicalRelation",
      126),
    // degree-oriented wedge: the canonical edge set and orientation are
    // LogicalRDD checkpoints; exactly two wedge-side Joins + two
    // left Joins onto nodes — a third wide Join (all-pairs) is the
    // 100 TB regression
    "q158_triangles" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>LogicalRelation>Aggregate>Filter>Generate>LogicalRDD>Aggregate>Filter>Generate>Project>Join>Project>Join>Filter>LogicalRDD>Filter>LogicalRDD>Filter>LogicalRDD",
      133),
    "q159_anchor_text" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Window>Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation",
      182),
    "q161_lpa_communities" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>Join>Project>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Join>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Filter>LogicalRelation>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation",
      367),
    "q163_containment" -> PlanGolden.Shape(
      "Project>Join>Aggregate>Project>Join>Project>Join>Aggregate>Project>Join>Project>Filter>Window>Project>Window>Union>Project>Join>Filter>LogicalRDD>Filter>Aggregate>Project>LogicalRDD>Project>Join>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Filter>Aggregate>Project>LogicalRDD>Project>Join>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD",
      223),
    "q164_robots" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Project>Filter>Window>WindowGroupLimit>Project>Join>Project>Filter>LogicalRelation>Project>Filter>Join>Project>Join>Aggregate>Project>Filter>Window>Project>Window>Project>Project>Filter>Generate>Aggregate>Project>Filter>LogicalRelation>Project>Filter>Window>Project>Window>Project>Project>Project>Filter>Generate>Aggregate>Project>Filter>LogicalRelation>Aggregate>Project>Join>Aggregate>Project>Filter>Window>Project>Window>Project>Project>Filter>Generate>Aggregate>Project>Filter>LogicalRelation>Project>Filter>Window>Project>Window>Project>Filter>Generate>Aggregate>Project>Filter>LogicalRelation",
      908),
    "q165_ccnet_buckets" -> PlanGolden.Shape(
      "Project>Window>Project>Join>Project>Aggregate>Project>Join>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation",
      141),
    "q166_inverted_index" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Window>Aggregate>Generate>Project>LogicalRelation",
      74),
    "q169_domain_stats_incremental" -> PlanGolden.Shape(
      "Project>Aggregate>Aggregate>Expand>Aggregate>Union>Aggregate>Project>Project>Filter>LogicalRelation>Aggregate>Project>Project>Filter>LogicalRelation",
      342),
    "q170_html_links" -> PlanGolden.Shape(
      "Project>Generate>Project>LogicalRelation",
      285),
    // one narrow kernel projection over the scan — the langid margins
    // are a single native expression; a second scan, a Generate, or an
    // expression-forest jump (the HOF formulation inlining) is the
    // regression
    "q172_langid_learned" -> PlanGolden.Shape(
      "Project>Project>LogicalRelation",
      39),
    // LogicalRDDs = the per-round lineage checkpoints; WITHOUT them the
    // totals-crossJoin doubles subtree references twice per half-step
    // and this tree grows ~8x PER ROUND (2984 expr nodes at 2 rounds
    // when it was caught) — the pin holds the round-bounded shape
    // end-to-end corpus pipeline: stages 1-3 (extract + C4 + paragraph
    // dedup) live BEHIND the eager checkpoint (the LogicalRDD leaves —
    // one execution for three consumers), so the gated plan is the LM
    // model Aggregate + broadcast score join + the split projection;
    // a LogicalRelation leaf appearing here means the checkpoint was
    // lost and the page scan re-executes per consumer
    "q180_corpus_pipeline" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRDD>Project>Aggregate>Project>Join>Project>Generate>Project>LogicalRDD>Aggregate>Generate>Project>LogicalRDD",
      128),
    // banded containment: sketch Aggregate + ONE probe Join + the
    // candidate-count Aggregate feeding the exact-verify join chain;
    // a second probe-side Join or a Window appearing is the regression
    // (the prefix-explode path sneaking back in)
    "q185_containment_banded" -> PlanGolden.Shape(
      "Project>Join>Aggregate>Project>Join>Project>Join>Project>Filter>Aggregate>Project>Join>Project>Filter>Window>Project>Window>Project>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD",
      173),
    // mergeable postings store: the store leg is the LogicalRDD
    // checkpoint, the batch leg one explode+Aggregate, the merge an
    // anti-Join + Union, and the derivation shares ONE term
    // partitioning (Window>WindowGroupLimit>Window); a second
    // LogicalRelation on the store leg = history text re-scan
    "q186_index_incremental" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Window>Union>Join>LogicalRDD>Aggregate>Project>Filter>LogicalRelation>Aggregate>Generate>Project>Filter>LogicalRelation",
      111),
    // store-served BM25: every leaf is the checkpointed postings store
    // (LogicalRDD) — a LogicalRelation appearing means document text
    // leaked back into the retrieval path; the WindowGroupLimit top-k
    // and the vocab-bounded broadcast joins are the q156 contract
    "q188_bm25_store" -> PlanGolden.Shape(
      "Project>Filter>Window>WindowGroupLimit>Aggregate>Project>Join>Project>Join>Project>Join>Project>Join>Filter>LogicalRDD>Aggregate>Project>LogicalRDD>Aggregate>Project>Join>Project>Filter>LogicalRDD>Aggregate>Project>LogicalRDD>Project>Filter>Window>GlobalLimit>LocalLimit>Sort>Aggregate>Project>LogicalRDD>Aggregate>Aggregate>Project>LogicalRDD",
      259),
    // containment apply: the exact pair join + sizes attach + the
    // keeper-rule anti-Join, sets checkpointed once for pairs/sizes/
    // survivors; a second pair-generation subtree is the regression
    "q191_containment_dedup" -> PlanGolden.Shape(
      "Project>Join>Aggregate>Project>LogicalRDD>Aggregate>Project>Join>Project>Join>Project>Join>Aggregate>Project>Join>Project>Join>Aggregate>Project>Join>Project>Filter>Window>Project>Window>Union>Project>Join>Filter>LogicalRDD>Filter>Aggregate>Project>LogicalRDD>Project>Join>Project>Join>Filter>LogicalRDD>Project>Filter>Aggregate>Project>LogicalRDD>Filter>Aggregate>Project>LogicalRDD>Project>Join>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD>Aggregate>Project>Filter>LogicalRDD",
      281),
    // the warm/store graph family (r18 verdict #4): store merge +
    // seeded iteration loops have the exact lineage exposure q176's
    // golden caught at 2,984 expression nodes; q196/q198's tiny
    // skeletons ARE the pin — the sweeps live behind localCheckpoints,
    // and losing that discipline changes the skeleton
    "q187_pagerank_warm" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Aggregate>Project>Join>Project>Join>Aggregate>Union>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation>Aggregate>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Aggregate>Union>LogicalRDD>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Aggregate>Project>Join>Project>Join>Aggregate>Union>Join>Filter>LogicalRDD>Project>Filter>LogicalRelation>Aggregate>Join>Project>Filter>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRelation>Aggregate>Aggregate>Union>LogicalRDD>Aggregate>Project>Generate>Project>Filter>LogicalRelation>Project>Filter>LogicalRDD",
      447),
    // r20: every half-step's sums are checkpointed and normalized
    // against a driver-scalar total, so the published plan is two
    // joins over flat LogicalRDDs — the iteration lineage is gone
    "q192_hits_warm" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>LogicalRelation>Project>LogicalRDD>Project>Filter>LogicalRDD",
      47),
    "q193_lpa_warm" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>Join>Project>LogicalRelation>Project>Filter>LogicalRDD>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Filter>LogicalRelation>Project>Filter>LogicalRDD>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Join>Project>Filter>LogicalRelation>Project>Filter>LogicalRDD>Aggregate>Aggregate>Project>Join>Filter>LogicalRDD>Project>Join>Project>Filter>LogicalRelation>Project>Filter>LogicalRDD",
      219),
    "q194_triangles_store" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>LogicalRelation>Aggregate>Filter>Generate>LogicalRDD>Aggregate>Filter>Generate>Project>Join>Project>Join>Filter>LogicalRDD>Filter>LogicalRDD>Filter>LogicalRDD",
      133),
    "q196_harmonic_store" -> PlanGolden.Shape(
      "Project>Join>Project>LogicalRelation>Aggregate>Union>Project>LogicalRDD>Project>LogicalRDD>Project>LogicalRDD",
      40),
    "q198_hyperball_warm" -> PlanGolden.Shape(
      "Project>LogicalRDD",
      10),
    "q176_hits" -> PlanGolden.Shape(
      "Project>Join>Project>Join>Project>LogicalRelation>Project>LogicalRDD>Project>Filter>LogicalRDD",
      47))

  test("golden snapshots: operator skeleton exact, expression forest within 1.5x") {
    val failures = golden.toSeq.sortBy(_._1).flatMap { case (name, expected) =>
      val actual = PlanGolden.shape(SparkEntry.queries(name)(spark, sfDir))
      val skeletonBad =
        if (actual.skeleton != expected.skeleton)
          Some(s"$name operator skeleton changed:\n  expected ${expected.skeleton}\n  actual   ${actual.skeleton}")
        else None
      val exprBad =
        if (actual.exprNodes > expected.exprNodes * 3 / 2)
          Some(s"$name expression forest exploded: ${expected.exprNodes} -> ${actual.exprNodes} " +
            "(q117-class inlining? materialize the shared subtree in a projection)")
        else None
      skeletonBad.toSeq ++ exprBad.toSeq
    }
    assert(failures.isEmpty,
      failures.mkString("\n") +
        "\nIf the change is intentional, regenerate: sbt \"Test/runMain graft.PlanGolden\"")
  }
}
