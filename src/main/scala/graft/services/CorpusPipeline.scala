package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.text.{Boilerplate, TextAnalysis}

/** The pretraining-corpus curation pipeline as ONE composed dataflow:
  * raw HTML pages → main-content extraction → C4 line hygiene →
  * cross-document paragraph dedup → unigram-LM scoring → split
  * assignment. Every stage is the production operator (Boilerplate,
  * TextAnalysis, TextDedup, Curator — each individually hash-gated);
  * this object owns only the COMPOSITION, which per-stage gates can't
  * see: column collisions, null propagation across stages, and the
  * scan/lineage discipline when one intermediate feeds three
  * consumers.
  *
  * Scale shape: extraction + hygiene fuse into a single narrow
  * projection over the page scan (no shuffle until the dedup
  * groupBys — plan-pinned in PlanShapeSpec); the deduped intermediate
  * is eagerly checkpointed because it feeds the LM model build, the
  * scoring pass and the final join (three non-identical subtrees —
  * the q163 checkpoint discipline; without it the page scan and the
  * whole extract/dedup chain re-execute per consumer). The LM stage
  * emits scores as CURATION SIGNAL columns rather than filtering on
  * absolute bounds: thresholding is a per-corpus policy decision
  * (CCNet freezes calibrated bounds), and an unconditional emit keeps
  * the pipeline output deterministic at any scale.
  */
object CorpusPipeline {

  /** Curate raw pages end-to-end. `lineate` manufactures line
    * structure for corpora without terminal punctuation (the q118
    * fixture trick) — identity for real prose.
    * → (doc_id, text, n_kept, n_tokens, n_oov, sum_nll_micro,
    *    avg_nll_micro, split) */
  def curate(
      pages: DataFrame, idCol: String, htmlCol: String,
      lineate: Column => Column = identity,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1),
      seed: Long = 42L): DataFrame = {
    // 1. extract main content — one narrow projection fused into the
    // page scan (no shuffle), then EAGERLY checkpointed: c4Metrics'
    // struct references its input ~6 times, and the block-stats HOFs
    // are interpreted (no whole-stage codegen, no common-subexpression
    // elimination), so without the barrier CollapseProject inlines the
    // WHOLE extract chain once per reference — measured 12.5 s vs
    // 5.6 s at sf0.1, the q117 inlining class. The checkpoint is
    // row-wise (no shuffle) and the materialized frame is just
    // (doc_id, lineated main text).
    val ext = pages
      .select(col(idCol).as("doc_id"), Boilerplate.blockStats(col(htmlCol)).as("_st"))
      .select(col("doc_id"),
        lineate(array_join(
          transform(filter(col("_st"), s => s.getField("content")),
            s => s.getField("text")), " ")).as("_mt"))
      .localCheckpoint(true)
    // 2. C4 line hygiene over the materialized extract
    val filt = ext
      .select(col("doc_id"), TextAnalysis.c4Metrics(col("_mt")).as("_c"))
      .filter(col("_c.passes"))
      .select(col("doc_id"), col("_c.clean_text").as("text"))
    // 3. cross-document paragraph dedup; checkpointed — feeds the LM
    // model build, the scoring pass and the final join
    val ded = TextDedup.dedupParagraphs(filt, "doc_id", "text")
      .localCheckpoint(true)
    // 4. unigram-LM scoring against the deduped corpus itself (the
    // outlier-vs-corpus-statistics variant; swap the model frame for a
    // trusted reference to get the CCNet shape)
    val model = TextAnalysis.unigramLm(ded.select(col("clean_text").as("text")), "text")
    val scored = TextAnalysis.lmScore(ded, "doc_id", "clean_text", model)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
        col("sum_nll_micro"), col("avg_nll_micro"))
    // 5. deterministic portable splits over the survivors
    Curator.assignSplits(
      ded.select(col("doc_id"), col("clean_text").as("text"), col("n_kept"))
        .join(scored, "doc_id"),
      col("doc_id"), splits, seed = seed, portable = true)
  }
}
