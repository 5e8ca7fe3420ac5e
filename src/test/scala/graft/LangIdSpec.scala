package graft

import org.apache.spark.sql.functions._

import graft.text.{LangId, TextAnalysis}

class LangIdSpec extends SparkSpec {

  private lazy val corpus = LangId.plantedCorpus(spark, 720, seed = 42L)
  // language cycles with doc_id % 6, so the held-out split alternates
  // BLOCKS of 6 — plain parity would put whole languages out of train
  private lazy val trainHalf = corpus.filter((col("doc_id") / 6).cast("long") % 2 === 0)
  private lazy val heldOut = corpus.filter((col("doc_id") / 6).cast("long") % 2 === 1)
  private lazy val model = LangId.train(trainHalf, "text", "lang", dim = 1024)

  test("charNgrams: exact grams, prefix cap, short and null text") {
    import spark.implicits._
    val row = Seq(("abcd", 1), (null.asInstanceOf[String], 2), ("x", 3))
      .toDF("t", "i")
    val got = row.select(col("i"), LangId.charNgrams(col("t"), 2, 3, 3).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    // maxChars = 3 truncates "abcd" to "abc" before gram extraction
    assert(got(1) == Seq("ab", "bc", "abc"))
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq.empty) // shorter than minN
  }

  test("learned language ID: >= 0.95 held-out accuracy; beats the stopword heuristic, which mis-assigns a measured share") {
    assert(model.langs.toSeq == LangId.PlantedLangs.map(_._1).sorted)
    val scored = LangId.score(heldOut, "doc_id", "text", model)
      .join(heldOut.select(col("doc_id").as("id"), col("lang").as("truth")), Seq("id"))
      .select((col("lang") === col("truth")).cast("int").as("hit"),
        col("confidence"))
      .collect()
    val acc = scored.map(_.getInt(0)).sum.toDouble / scored.length
    assert(acc >= 0.95, s"learned held-out accuracy $acc")
    assert(scored.forall { r =>
      val c = r.getDouble(1); c > 0.0 && c <= 1.0 + 1e-12
    })
    // the q97 stopword heuristic on the same held-out frame: it knows
    // only en/de/fr/es, so it necessarily mis-assigns it/pt (and its
    // tiny profiles clip real-language recall too). The measured gap
    // is the reason the learned path is production (VERDICT r13 #1).
    val heur = heldOut
      .select((TextAnalysis.languageId(col("text")) === col("lang")).cast("int").as("hit"))
      .collect().map(_.getInt(0))
    val heurAcc = heur.sum.toDouble / heur.length
    assert(heurAcc <= 0.75, s"stopword heuristic unexpectedly strong: $heurAcc")
    assert(acc > heurAcc + 0.2, s"learned $acc vs heuristic $heurAcc")
  }

  test("native LangIdMargins kernel equals the column-algebra twin bit-for-bit (feature-map parity)") {
    // the kernel hand-rolls lower/substring/murmur3 — this pin is what
    // guarantees a model TRAINED through the SQL featurizer scores
    // identically through the codegen'd loop (unicode text included:
    // the planted corpus carries diacritics; add some multibyte extras)
    import spark.implicits._
    val frame = heldOut.select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, "añil über façade— 北京 עברית"),
        (9002L, ""), (9003L, "a"),
        (9004L, "x" * 500) // past the 200-char cap
      ).toDF("doc_id", "text"))
    val both = frame.select(
      graft.functions.LangIdMargins.margins(coalesce(col("text"), lit("")), model).as("native"),
      graft.text.LangId.marginsHof(col("text"), model).as("hof"))
      .collect()
    both.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a == b, s"kernel/twin margin mismatch: $a vs $b")
    }
  }

  test("scoring is Exchange-free (the 100 TB contract) and refits reproduce bit-identically") {
    val plan = LangId.score(heldOut, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be shuffle-free:\n$plan")
    val refit = LangId.train(trainHalf, "text", "lang", dim = 1024)
    assert(refit.intercepts.sameElements(model.intercepts))
    assert(refit.weights.zip(model.weights).forall { case (a, b) => a.sameElements(b) })
  }

  test("gram-less rows score the intercept prior deterministically; degenerate training throws") {
    import spark.implicits._
    val got = LangId.score(Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    // empty text → margins = intercepts; winner = max intercept with
    // class-order tie-break
    val k = model.intercepts.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
    assert(got.getAs[String]("lang") == model.langs(k))
    intercept[IllegalArgumentException] {
      LangId.train(corpus.filter(col("lang") === "en"), "text", "lang", dim = 64)
    }
  }

  test("plantedCorpus is pure in (doc_id, seed): regeneration is bit-identical, languages cycle") {
    val a = LangId.plantedCorpus(spark, 60, seed = 7L).collect().map(_.toSeq)
    val b = LangId.plantedCorpus(spark, 60, seed = 7L).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val langs = LangId.plantedCorpus(spark, 12, seed = 7L)
      .orderBy("doc_id").collect().map(_.getString(2))
    assert(langs.toSeq == (0 until 12).map(i => LangId.PlantedLangs(i % 6)._1))
  }
}
