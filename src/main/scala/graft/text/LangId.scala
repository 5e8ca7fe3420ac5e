package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned language identification — the fastText-shaped classifier
  * CCNet's published recipe puts exactly here (Joulin et al. 2016
  * "Bag of Tricks for Efficient Text Classification"; Wenzek et al.
  * 2019 "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data"): a linear model over hashed character n-grams,
  * replacing [[TextAnalysis.languageId]]'s stopword-count heuristic
  * as the production path that q165's per-language percentile buckets
  * and q120's per-language rebalance consume. Character n-grams (not
  * word tokens) are the published feature choice for language ID —
  * they see orthography (diacritics, digraphs, function-word shapes)
  * and survive domains where the stopword list simply does not occur.
  *
  * The split mirrors [[QualityFilter]], generalized from binary to
  * multinomial:
  *
  *  - TRAINING is the bounded offline step: hashed char-n-gram counts
  *    (hashing trick, `dim` buckets, no vocabulary state) feed MLlib's
  *    multinomial LogisticRegression (zero init + L-BFGS — no RNG, so
  *    refits on the same frame reproduce bit-identically). Labeled
  *    language data is the expensive resource (CCNet trains on
  *    Wikipedia); frames are small by construction.
  *  - SCORING is the 100 TB path: a pure per-row projection. The
  *    fitted K×dim matrix travels as K `dim`-double array LITERALS;
  *    each class margin is a higher-order `aggregate` fold over the
  *    row's OWN n-gram array — no explode, no join, no shuffle
  *    (TextSpec pins the Exchange-free plan), composes onto a
  *    streaming frame in append mode.
  *
  * Train and score agree on the feature map by sharing ONE column
  * expression ([[featureIdx]] = `pmod(hash(gram), dim)`, Spark SQL's
  * Murmur3) — the [[QualityFilter]] discipline: never trust two hash
  * implementations to match.
  */
object LangId {

  /** A fitted language model: `weights(k)(i)` is class k's coefficient
    * for hash bucket i, `langs(k)` its label (sorted — the training
    * label indexing), plus per-class intercepts and the feature-map
    * parameters scoring must replay exactly. Plain values,
    * serializable into a plan; persist as (lang, index, weight) rows
    * if it must outlive the session. */
  final case class Model(
      langs: Array[String], weights: Array[Array[Double]],
      intercepts: Array[Double], dim: Int,
      minN: Int, maxN: Int, maxChars: Int) {
    require(langs.length == weights.length && langs.length == intercepts.length,
      s"langs/weights/intercepts mismatch: ${langs.length}/${weights.length}/${intercepts.length}")
    require(weights.forall(_.length == dim), "weight row/dim mismatch")
  }

  /** The shared train/score feature map: n-gram → hash bucket. */
  private def featureIdx(gram: Column, dim: Int): Column =
    pmod(hash(gram), lit(dim))

  /** Character n-grams of the lowercased text, n ∈ [minN, maxN], over
    * the first `maxChars` characters only — language is decidable from
    * a bounded prefix (CCNet classifies paragraphs), and the cap keeps
    * per-row work constant regardless of document length, which is
    * what makes the scoring fold safely linear at corpus scale. Null
    * text → empty array.
    *
    * The lowercased prefix is BOUND ONCE per row through a
    * single-element `transform` before the per-position lambdas touch
    * it — a lambda that closed over the raw `substring(lower(text))`
    * subtree would re-evaluate it PER ELEMENT (the q117 defect class:
    * ~maxChars × grams character work per row; measured 10 s vs
    * sub-second on a 5k-doc scoring pass). Inside the binder the
    * position lambdas see a lambda VARIABLE — one evaluation, many
    * readers. */
  def charNgrams(text: Column, minN: Int, maxN: Int, maxChars: Int): Column = {
    val prefix = substring(lower(coalesce(text, lit(""))), 1, maxChars)
    element_at(
      transform(array(prefix), s =>
        concat((minN to maxN).map { n =>
          val cnt = length(s) - lit(n - 1)
          when(cnt >= 1,
            transform(sequence(lit(1), cnt), i => substring(s, i, lit(n))))
            .otherwise(array().cast("array<string>"))
        }: _*)),
      1)
  }

  /** Fit a multinomial logistic-regression language model on a labeled
    * frame (`langCol` = language label strings). Classes are the
    * DISTINCT labels sorted ascending — a deterministic indexing that
    * needs no StringIndexer state. Features are hashed char-n-gram
    * COUNTS; `regParam` is L2 (the hashing trick aliases grams into
    * buckets; ridge keeps aliased weights bounded). Empty labeled
    * frame → the uninformative zero model over zero classes is
    * useless, so that degenerate case throws — language ID with no
    * training languages is a caller bug, not a recoverable state. */
  def train(
      docs: DataFrame, textCol: String, langCol: String,
      dim: Int = 1024, minN: Int = 1, maxN: Int = 3, maxChars: Int = 200,
      regParam: Double = 0.01, maxIter: Int = 60): Model = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(1 <= minN && minN <= maxN, s"bad n-gram range [$minN, $maxN]")
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col(langCol).cast("string").as("lang"),
        transform(charNgrams(col(textCol), minN, maxN, maxChars),
          g => featureIdx(g, dim)).as("_idx"))
      .as[(String, Seq[Int])]
    // ONE bounded job decides the path AND feeds the local fit: a
    // limit(bound+1) collect returns every row when the frame is
    // within the driver bound (the common case — labeled language
    // data is the expensive resource) and proves it is over the bound
    // otherwise, without a separate count pass over the featurizer.
    val collected = hashed.limit(LogitFit.MaxDriverRows.toInt + 1).collect()
    if (collected.length <= LogitFit.MaxDriverRows) {
      // Run the zero-init L-BFGS fit on the driver. MLlib's
      // distributed fit launches one treeAggregate JOB per step — 60
      // sequential jobs whose scheduling overhead was ~3 s of q172's
      // 3.5 s wall for a 360-row frame (r20, guide §1.2/§5); the local
      // fit is the same deterministic optimization in-process.
      val langs = collected.map(_._1).distinct.sorted
      require(langs.length >= 2, s"need >= 2 languages to train, got ${langs.toSeq}")
      val langIdx = langs.zipWithIndex.toMap
      val rows = collected.map { case (lang, idx) => LogitFit.toRow(langIdx(lang), idx) }
      val (w, b) = LogitFit.fitMultinomial(rows, langs.length, dim, regParam, maxIter)
      return Model(langs, w, b, dim, minN, maxN, maxChars)
    }
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    // bounded: the distinct label set (a handful of languages)
    val langs = docs.select(col(langCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    require(langs.length >= 2, s"need >= 2 languages to train, got ${langs.toSeq}")
    val langIdx = langs.zipWithIndex.toMap
    val bIdx = spark.sparkContext.broadcast(langIdx)
    val data = hashed
      .map { case (lang, idx) =>
        val counts = idx.groupBy(identity).toSeq
          .map { case (i, occ) => (i, occ.size.toDouble) }.sortBy(_._1)
        (bIdx.value(lang).toDouble, Vectors.sparse(dim, counts))
      }
      .toDF("label", "features")
    // L-BFGS launches one treeAggregate job per step; a frame
    // scattered over default parallelism pays per-task overhead 60
    // times over. ~5k rows per partition, floor 1 — a genuinely large
    // frame keeps its parallelism; cache so the featurization pipeline
    // is not recomputed per step.
    val total = data.count()
    val sized = data
      .coalesce(math.max(1L, math.min(
        data.rdd.getNumPartitions.toLong, (total + 4999) / 5000)).toInt)
      .cache()
    val fitted =
      try new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(regParam).setFamily("multinomial")
        .setFeaturesCol("features").setLabelCol("label")
        .fit(sized)
      finally { sized.unpersist(); () }
    val m = fitted.coefficientMatrix // K x dim, row k = class k
    val w = Array.tabulate(langs.length)(k => Array.tabulate(dim)(i => m(k, i)))
    Model(langs, w, fitted.interceptVector.toArray, dim, minN, maxN, maxChars)
  }

  /** The scoring margins as pure column algebra — ONE fold carrying
    * all K class margins over the hashed bucket array. Semantically
    * identical to the native kernel (same grams, same murmur3 buckets,
    * same left-to-right addition order); kept as the SPEC TWIN that
    * pins [[graft.functions.LangIdMargins]] bit-for-bit, and as the
    * reference formulation for engines without expression extension
    * points. Interpreted higher-order dispatch makes it ~10× the
    * kernel's wall — which is exactly why score() uses the kernel. */
  private[graft] def marginsHof(text: Column, model: Model): Column = {
    val k = model.langs.length
    val dim = model.dim
    val wFlat = lit(model.weights.flatten)
    val prefix = substring(lower(coalesce(text, lit(""))), 1, model.maxChars)
    val buckets = element_at(
      transform(array(prefix), s =>
        concat((model.minN to model.maxN).map { n =>
          val cnt = length(s) - lit(n - 1)
          when(cnt >= 1,
            transform(sequence(lit(1), cnt),
              i => featureIdx(substring(s, i, lit(n)), dim)))
            .otherwise(array().cast("array<int>"))
        }: _*)),
      1)
    aggregate(buckets, lit(model.intercepts),
      (acc, b) => transform(sequence(lit(0), lit(k - 1)),
        i => element_at(acc, i + 1) + element_at(wFlat, i * dim + b + 1)))
  }

  /** Score a corpus with a fitted model — the scale path: one narrow
    * Exchange-free projection whose margins come from the native
    * [[graft.functions.LangIdMargins]] kernel (whole-stage codegen:
    * prefix lowered once, one murmur3 per gram, all K margins in one
    * fused loop — ~10× the interpreted [[marginsHof]] twin, which
    * LangIdSpec pins it against bit-for-bit). The winner is the max
    * margin (ties broken by class order — deterministic) and
    * `confidence` its softmax mass. Gram-less/null rows get every
    * class's bare intercept — the model's prior — rather than null.
    * → (id, lang, confidence) */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    docs
      .withColumn("_m", graft.functions.LangIdMargins.margins(
        coalesce(col(textCol), lit("")), model))
      .select(col(idCol).as("id"),
        element_at(lit(model.langs), array_position(col("_m"), array_max(col("_m"))).cast("int"))
          .as("lang"),
        (lit(1.0) / aggregate(col("_m"), lit(0.0),
          (acc, m) => acc + exp(m - array_max(col("_m"))))).as("confidence"))
  }

  // --- deterministic planted multilingual corpus (the training and
  // --- accuracy-gate fixture: the driver's documents table carries
  // --- word-soup text whose lang column is independent of the text,
  // --- so a REAL multilingual fixture has to be planted)

  /** Function-word profiles per language — public high-frequency words
    * (the same public knowledge as [[TextAnalysis.Stopwords]], wider,
    * plus two languages the stopword heuristic does not know at all,
    * so the learned-vs-heuristic accuracy gap is measurable on them). */
  val PlantedLangs: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine",
      "zu", "nicht", "auch", "auf", "sich", "für", "über", "wir", "dass"),
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it",
      "was", "for", "with", "as", "his", "they", "at", "this"),
    "es" -> Seq("el", "los", "las", "y", "es", "de", "un", "una", "en", "que",
      "no", "se", "por", "con", "para", "su", "más", "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "dans", "que",
      "ne", "pas", "pour", "qui", "sur", "avec", "plus", "vous"),
    "it" -> Seq("il", "lo", "gli", "e", "è", "di", "un", "una", "che", "non",
      "si", "per", "con", "del", "della", "come", "più", "anche"),
    "pt" -> Seq("o", "os", "as", "e", "é", "de", "um", "uma", "em", "que",
      "não", "se", "por", "com", "para", "mais", "como", "são"))

  /** Language-flavored synthetic content word: each language draws its
    * syllables from a distinct consonant/vowel inventory (including
    * its characteristic diacritics), so character n-grams carry the
    * orthographic signal real languages do. Pure in (lang, rank). */
  def contentWord(langIdx: Int, rank: Int, rng: java.util.Random): String = {
    val cons = Array(
      "bdfghklmnrstwz", // de (plus sch-like clusters via doubling)
      "bcdfghlmnprstwy", // en
      "bcdfghlmnñprst", // es
      "bcdfghjlmnprst", // fr
      "bcdfglmnprstvz", // it
      "bcdfghlmnprstvç") // pt
    val vows = Array("aeiouäöü", "aeiou", "aeiouáéí", "aeiouéèê", "aeiouàè", "aeiouãõê")
    val c = cons(langIdx); val v = vows(langIdx)
    val syll = 1 + rank % 3
    val sb = new StringBuilder
    var i = 0
    while (i < syll) {
      sb.append(c(rng.nextInt(c.length))).append(v(rng.nextInt(v.length)))
      i += 1
    }
    sb.toString
  }

  /** Deterministic multilingual corpus: `nDocs` rows of (doc_id, text,
    * lang), language = doc_id mod |langs|, text = 20–60 words mixing
    * the language's function words (~40%) with its language-flavored
    * content words. Pure function of (doc_id, seed) — a narrow
    * distributed map over `spark.range`, the [[graft.ZipfCorpus]]
    * discipline, so any size reproduces bit-identically at any
    * parallelism. */
  def plantedCorpus(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val langs = PlantedLangs
    spark.range(nDocs).as[Long].map { docId =>
      val li = (docId % langs.length).toInt
      val (lang, fw) = langs(li)
      val rng = new java.util.Random(docId * 0x9E3779B97F4A7C15L + seed)
      val len = 20 + rng.nextInt(41)
      val words = Array.fill(len) {
        if (rng.nextDouble() < 0.4) fw(rng.nextInt(fw.length))
        else contentWord(li, rng.nextInt(12), rng)
      }
      (docId, words.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
  }
}
