package graft

import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.orchestration.Pipeline
import graft.orchestration.Pipeline.Stage
import graft.services.Curator
import graft.text.TextAnalysis

/** The whole pretraining-data workload, composed end-to-end through
  * the Pipeline DAG: hygiene filters → quality-aware near-dup removal
  * → benchmark decontamination → unigram-LM perplexity gate → learned
  * quality filter → repeated-span trimming → chunking,
  * packing and splits. Every stage is the production operator (no
  * test doubles); the corpus plants one defect per stage so each
  * stage's effect is individually observable in the final output —
  * the "a user of the reference could run their entire workload"
  * claim as a single executable fact. Because stages return lazy
  * DataFrames, the DAG composes into ONE logical plan per terminal
  * output (no materialization barriers between stages — see
  * Pipeline's Spark-first stance).
  */
class CorpusPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val footer =
    "all rights reserved contact the site operator for permission details"

  private def own(i: Long): String = (1 to 20).map(j => s"w${i}x$j").mkString(" ")

  private lazy val corpus = {
    val base = (1L to 30L).map(i => i -> s"${own(i)} $footer")
    val exactDup = Seq(101L -> s"${own(1)} $footer")
    val nearDup = // doc 2 with the tail shortened: lower quality, same shingle mass
      Seq(102L -> s"${(1 to 18).map(j => s"w2x$j").mkString(" ")} $footer")
    val contaminated = Seq(103L -> s"${own(103)} ${(1 to 15).map(j => s"q$j").mkString(" ")} $footer")
    val spam = Seq(104L -> Seq.fill(30)("spam alert").flatMap(_.split(" ")).mkString(" "))
    // gibberish: unique non-repetitive alien tokens and NO footer — slips
    // past hygiene (no repetition), dedup (unique shingles) and
    // decontamination (no eval grams); only the LM gate can see it
    val gibberish = Seq(105L -> (1 to 20).map(j => s"zx${j}q").mkString(" "))
    // the ad doc: distinct tokens (passes hygiene), ~0.18 footer-shingle
    // Jaccard vs any base doc (passes dedup at t=0.5), no eval 13-grams
    // (passes decontamination), and 10 of 26 tokens in the reference
    // vocabulary — avg NLL ≈ qlog(21) − (10/26)·qlog(2) ≈ 2.77e6, inside
    // the LM gate's bounds. Only the LEARNED filter, trained on labeled
    // examples of exactly this vocabulary, can see it.
    val ad = Seq(106L -> s"${adVocab.mkString(" ")} $footer")
    (base ++ exactDup ++ nearDup ++ contaminated ++ spam ++ gibberish ++ ad)
      .toDF("doc_id", "text")
  }

  private val adVocab = (1 to 16).map(j => s"promo${j}buy")

  // FineWeb-Edu-shape labeled frame: positives are a SAMPLE OF THE
  // CORPUS ITSELF (docs 1-10 — labeling a corpus sample is how the
  // published recipe gets labels), negatives are pure ad-vocabulary
  // rows. Deterministic fit (zero init + L-BFGS, no RNG) → the stage
  // is reproducible bit-for-bit.
  private lazy val labeledQuality = {
    val pos = (1L to 10L).map(i => (s"${own(i)} $footer", 1.0))
    val neg = (1L to 10L).map(i =>
      (adVocab.drop((i % 4).toInt).mkString(" "), 0.0))
    (pos ++ neg).toDF("text", "label")
  }

  private lazy val evalSuite =
    Seq(900L -> (1 to 15).map(j => s"q$j").mkString(" ")).toDF("doc_id", "text")

  // the trusted reference the LM gate scores against (footer vocabulary:
  // base docs keep 10 known tokens of 30 → low avg NLL; gibberish is
  // 100% OOV → avg NLL = qlog(D) exactly, the ceiling)
  private lazy val refCorpus = Seq(999L -> footer).toDF("doc_id", "text")

  test("pretraining pipeline end-to-end: each planted defect dies at its stage") {
    val stages = Seq(
      // Gopher-style repetition hygiene: kills the spam doc (104)
      Stage("hygiene", Seq("docs"), in =>
        in("docs").filter(TextAnalysis.passesRepetitionFilter(col("text")))),
      // quality-aware near-dup removal: collapses {1,101} (tie → min
      // id) and {2,102} (longer doc wins)
      Stage("dedup", Seq("hygiene"), in =>
        TextDedup.removeNearDuplicatesBy(
          in("hygiene"), "doc_id", "text", quality = length(col("text")))),
      // 13-gram benchmark decontamination: kills 103
      Stage("decontaminate", Seq("dedup", "eval"), in =>
        in("dedup").join(
          TextDedup.contamination(in("dedup"), in("eval"), "doc_id", "text")
            .filter(!col("contaminated")).select(col("id").as("doc_id")),
          Seq("doc_id"))),
      // unigram-LM perplexity gate against the trusted reference:
      // kills the gibberish doc (105) — 100% OOV lands it in 'tail'
      // (bounds sit between the base docs' avg NLL ≈ qlog(21) −
      // 10·qlog(2)/30 ≈ 2.81e6 and the OOV ceiling qlog(21) ≈ 3.04e6)
      Stage("lm_gate", Seq("decontaminate"), in =>
        in("decontaminate").join(
          TextAnalysis.lmScore(in("decontaminate"), "doc_id", "text",
              TextAnalysis.unigramLm(refCorpus, "text"), bucketBounds = (2.9e6, 3.0e6))
            .filter(col("ppl_bucket") =!= "tail").select(col("id").as("doc_id")),
          Seq("doc_id"))),
      // learned quality filter (FineWeb-Edu shape): the model trained
      // on the labeled frame kills the ad doc (106) — the one defect
      // no rule-based or LM-likelihood stage upstream can see
      Stage("learned_filter", Seq("lm_gate"), in => {
        val model = graft.text.QualityFilter.train(
          labeledQuality, "text", "label", dim = 1024)
        in("lm_gate").join(
          graft.text.QualityFilter.score(in("lm_gate"), "doc_id", "text", model)
            .filter(col("keep")).select(col("id").as("doc_id")),
          Seq("doc_id"))
      }),
      // substring-level dedup: cuts the universal footer span
      Stage("trim", Seq("learned_filter"), in =>
        TextDedup.trimRepeatedSpans(in("learned_filter"), "doc_id", "text", k = 8)),
      // RAG/window chunking of the trimmed text
      Stage("chunk", Seq("trim"), in =>
        Curator.chunkDocs(in("trim"), "id", "text", maxTokens = 16, overlap = 4)),
      // fixed-token-budget training packs over trimmed lengths
      Stage("pack", Seq("trim"), in =>
        Curator.packSequences(in("trim"), "id", "n_kept_tokens", maxTokensPerPack = 64)),
      // deterministic splits over the surviving ids
      Stage("split", Seq("trim"), in =>
        Curator.assignSplits(in("trim").select(col("id")), col("id"),
          Seq("train" -> 0.9, "val" -> 0.1), seed = 7L)),
      // tokenizer construction on the CLEANED corpus (the published
      // ordering: BPE trains after hygiene/dedup/trim so boilerplate
      // can't earn merges) + per-doc token accounting
      Stage("tokenize", Seq("trim"), in => {
        val merges = graft.text.Bpe.train(in("trim"), "text", nMerges = 10, minFreq = 2L)
        graft.text.Bpe.tokenCounts(in("trim"), "id", "text", merges)
      }))

    val r = Pipeline.run("pretrain", stages,
      Map("docs" -> corpus, "eval" -> evalSuite))
    assert(r.success, s"pipeline must succeed: ${r.stages}")

    // after decontamination: spam, both dup copies and the
    // contaminated doc are gone; the gibberish and ad docs are still
    // alive (nothing upstream can see either)
    val afterDecon = r("decontaminate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterDecon == (1L to 30L).toSet + 105L + 106L, s"after decontaminate: $afterDecon")

    // the LM gate kills the gibberish doc — but NOT the ad doc, whose
    // footer tokens keep it inside the perplexity bounds
    val afterLm = r("lm_gate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterLm == (1L to 30L).toSet + 106L, s"after lm_gate: $afterLm")

    // the learned filter is what kills the ad doc: survivors = exactly
    // the 30 base docs (docs 11-30 were NOT in the labeled sample —
    // their footer tokens carry them past the threshold)
    val survivors = r("learned_filter").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == (1L to 30L).toSet, s"survivors: $survivors")

    // trim cut the footer (and ONLY the footer: every doc keeps its
    // 20 own tokens — cross-boundary grams are unique per doc)
    val trimmed = r("trim").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(3)))).toMap
    assert(trimmed.values.forall(_._2 == 20L), "every doc must keep exactly its own tokens")
    assert(!trimmed.values.exists(_._1.contains("rights")), "footer must be cut everywhere")
    assert(trimmed(5L)._1 == own(5), "own tokens must survive in order")

    // chunks: 20 trimmed tokens at (16, 4) → two windows per doc
    val chunks = r("chunk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    assert(chunks.length == 60 && chunks.forall(_._4 <= 16))
    val d5 = chunks.filter(_._1 == 5L).sortBy(_._2).map(_._3)
    assert((d5.head.split(" ") ++ d5(1).split(" ").drop(4)).mkString(" ") == own(5))

    // packs respect the budget; every survivor packed exactly once
    val packs = r("pack").groupBy("pack_id").agg(sum("n_kept_tokens").as("tok"))
    assert(r("pack").count() == 30 && packs.filter(col("tok") > 64).count() == 0)

    // BPE accounting over the trimmed survivors: every doc tokenized,
    // 20 words each, and the learned merges compress strictly below
    // the character count while never dropping below the word count
    val toks = r("tokenize").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(toks.keySet == (1L to 30L).toSet, s"tokenized ids: ${toks.keySet}")
    assert(toks.values.forall { case (w, t) => w == 20L && t >= w })
    assert(toks(5L)._2 < own(5).count(_ != ' ').toLong,
      "BPE merges must compress below the per-character count")

    // splits cover every survivor with labels from the ratio set
    val splits = r("split").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(splits.keySet == (1L to 30L).toSet)
    assert(splits.values.toSet.subsetOf(Set("train", "val")))
  }

  test("CCNet composition on LEARNED labels: q165's per-language buckets consume LangId predictions") {
    import graft.text.LangId
    // the production CCNet order (Wenzek et al. 2019): language ID
    // first, then per-LANGUAGE perplexity thirds — q165's fixture uses
    // the table's lang column; the real pipeline has no labels and
    // must bucket on the CLASSIFIER's output, so the bucketing is only
    // as good as the labels it rides. This composes the two stages
    // end-to-end and pins both halves.
    val planted = LangId.plantedCorpus(spark, 360, seed = 11L)
    val evenBlocks = (col("doc_id") / 6).cast("long") % 2 === 0
    val model = LangId.train(planted.filter(evenBlocks), "text", "lang", dim = 1024)
    val preds = LangId.score(planted, "doc_id", "text", model)
      .select(col("id").as("doc_id"), col("lang").as("pred_lang"))
    val withTruth = planted.join(preds, "doc_id")
    val acc = withTruth.filter(col("lang") === col("pred_lang")).count().toDouble / 360
    assert(acc >= 0.95, s"LangId accuracy on the pipeline corpus: $acc")
    // per-language LM thirds over the PREDICTED partitions — the q165
    // operator unchanged, only the grouping column now comes from the
    // classifier
    val lm = TextAnalysis.unigramLm(planted.filter(evenBlocks), "text")
    val scored = TextAnalysis.lmScore(
      planted.filter(!evenBlocks), "doc_id", "text", lm)
      .select(col("id").as("doc_id"), col("avg_nll_micro"))
    val bucketed = TextAnalysis.bucketByPercentile(
      scored.join(preds, "doc_id"), "avg_nll_micro", Seq("pred_lang"))
    val sizes = bucketed.groupBy("pred_lang", "pct_bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = sizes.keys.map(_._1).toSet
    assert(langs == LangId.PlantedLangs.map(_._1).toSet,
      s"every planted language must form its own bucket partition: $langs")
    // thirds within each predicted language (percent_rank thirds can
    // drift by a row or two when predictions shift partition sizes)
    langs.foreach { l =>
      val total = sizes.collect { case ((`l`, _), n) => n }.sum
      Seq("head", "middle", "tail").foreach { b =>
        val n = sizes.getOrElse((l, b), 0L)
        assert(math.abs(n - total / 3.0) <= 2.0,
          s"$l/$b: $n of $total is not a third")
      }
    }
  }

  test("CorpusPipeline.curate (q180): deterministic, schema-stable, checkpoint-bounded plan") {
    val q = SparkEntry.queries("q180_corpus_pipeline")
    val out = q(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq == Seq("doc_id", "text", "n_kept", "n_tokens",
      "n_oov", "sum_nll_micro", "avg_nll_micro", "split"))
    val rows = out.collect()
    assert(rows.nonEmpty, "the pipeline must keep survivors")
    // survivors are a subset of the input corpus and every split valid
    assert(rows.forall(r => Set("train", "test", "val")(r.getString(7))))
    // bit-determinism: a second full construction lands identically
    val again = q(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // the gated plan reads ONLY the checkpointed dedup intermediate —
    // a parquet scan here means the extract chain re-executes per
    // consumer (model build / scoring / final join)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), s"page scan leaked past the checkpoint:\n$plan")
  }

  test("CorpusPipeline stages 1-2 fuse into one scan with no shuffle") {
    import graft.text.{Boilerplate, TextAnalysis}
    // the extract + C4 projection exactly as curate composes it, over
    // a real parquet scan: one FileScan, zero Exchange — the whole
    // hygiene front of the pipeline pipelines into the page read
    val pages = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")).as("html"))
    val fused = pages
      .select(col("doc_id"), Boilerplate.blockStats(col("html")).as("_st"))
      .select(col("doc_id"),
        array_join(transform(filter(col("_st"), s => s.getField("content")),
          s => s.getField("text")), " ").as("_main"))
      .select(col("doc_id"), TextAnalysis.c4Metrics(col("_main")).as("_c"))
      .filter(col("_c.passes"))
      .select(col("doc_id"), col("_c.clean_text").as("text"))
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extract+filter must not shuffle:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1, s"exactly one page scan:\n$plan")
  }
}
