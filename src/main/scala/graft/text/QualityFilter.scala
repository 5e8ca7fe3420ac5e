package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned (model-based) document quality filter — the FineWeb-Edu /
  * DCLM-shape classifier step (Penedo et al. 2024, "The FineWeb
  * Datasets"; Li et al. 2024, "DataComp-LM") that completes the
  * hygiene family: q117/q118 are RULE-based and q129/q130 are
  * LM-likelihood-based; this is the supervised third leg — train a
  * linear classifier on a labeled frame, then score the corpus with
  * it.
  *
  * Spark-first split, mirroring the reference-free LM scorers
  * ([[TextAnalysis.lmScoreStateless]]):
  *
  *  - TRAINING is the bounded offline step: hashed token counts
  *    (the hashing trick — no vocabulary state, `dim` buckets) feed a
  *    seedless-deterministic MLlib LogisticRegression (zero init +
  *    L-BFGS: no RNG anywhere, so refits on the same frame reproduce).
  *    Labeled frames are small by construction (human or LLM labels
  *    are the expensive resource — FineWeb-Edu trains on ~500k rows),
  *    so this fits MLlib's iterative treeAggregate comfortably.
  *  - SCORING is the 100 TB path and must look like q117: a pure
  *    per-row projection. The fitted weights travel as one
  *    `dim`-double array LITERAL; the margin is a higher-order
  *    `aggregate` fold over the row's own token array — no explode,
  *    no join, no shuffle, composes onto a streaming frame in append
  *    mode (TextSpec pins the no-Exchange plan).
  *
  * Train and score agree on the feature map by sharing ONE column
  * expression ([[featureIdx]]): `pmod(hash(token), dim)` — Spark SQL's
  * Murmur3 — rather than trusting two hash implementations to match.
  */
object QualityFilter {

  /** A fitted filter: `weights(i)` is the coefficient of hash bucket
    * i, plus the intercept. Plain values, serializable into a plan —
    * persist as (index, weight) rows if it must outlive the session. */
  final case class Model(weights: Array[Double], intercept: Double, dim: Int) {
    require(weights.length == dim, s"weights/dim mismatch: ${weights.length} vs $dim")
  }

  /** The shared train/score feature map: token → hash bucket. */
  private def featureIdx(token: Column, dim: Int): Column =
    pmod(hash(token), lit(dim))

  /** Fit a logistic-regression quality model on a labeled frame
    * (`labelCol` ∈ {0.0, 1.0}; 1 = keep-worthy). Features are hashed
    * token COUNTS (`dim` buckets). `regParam` is L2 — the hashing
    * trick aliases tokens into buckets, and a little ridge keeps
    * aliased weights bounded. */
  def train(
      docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1024, regParam: Double = 0.01, maxIter: Int = 50): Model = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = docs.sparkSession
    import spark.implicits._
    // the labeled frame is the bounded input; hashed indices are built
    // from the row's OWN tokens — distributed, no vocabulary
    // broadcast, no global state
    val hashed = docs
      .select(col(labelCol).cast("double").as("label"),
        transform(TextAnalysis.tokens(col(textCol)),
          t => featureIdx(t, dim)).as("_idx"))
      .as[(Double, Seq[Int])]
    // ONE bounded job decides the path AND feeds the local fit (the
    // LangId.train stance): limit(bound+1) returns every row when the
    // frame fits the driver bound, proves it is over it otherwise.
    val collected = hashed.limit(LogitFit.MaxDriverRows.toInt + 1).collect()
    // EMPTY labeled frame → the uninformative prior model (all-zero
    // weights, zero intercept: every doc scores 0.5) rather than
    // MLlib's summarizer exception — the first batch of a new
    // pipeline is empty, and train must survive it (EmptyInputSpec
    // contract).
    if (collected.isEmpty) Model(Array.fill(dim)(0.0), 0.0, dim)
    else if (collected.length <= LogitFit.MaxDriverRows) {
      // Zero-init L-BFGS fit on the driver instead of paying MLlib's
      // one-treeAggregate-job-per-step overhead 50 times
      // (r20, guide §1.2/§5 — see [[LogitFit]]).
      val rows = collected.map { case (label, idx) =>
        LogitFit.toRow(math.round(label).toInt, idx)
      }
      val (w, b) = LogitFit.fitBinomial(rows, dim, regParam, maxIter)
      Model(w, b, dim)
    } else {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.linalg.Vectors
      val data = hashed
        .map { case (label, idx) =>
          val counts = idx.groupBy(identity).toSeq
            .map { case (i, occ) => (i, occ.size.toDouble) }.sortBy(_._1)
          (label, Vectors.sparse(dim, counts))
        }
        .toDF("label", "features")
      val fitted = new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(regParam)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(data)
      Model(fitted.coefficients.toArray, fitted.intercept, dim)
    }
  }

  /** Score a corpus with a fitted model — the scale path: one narrow
    * projection, weights as an array literal, margin = intercept +
    * Σ_token w(bucket(token)) folded over the row's token array.
    * → (id, n_tokens, margin, quality_score ∈ (0,1), keep).
    * Token-less rows score sigmoid(intercept) — the model's prior. */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: Model, threshold: Double = 0.5): DataFrame = {
    val w = lit(model.weights)
    val toks = TextAnalysis.tokens(col(textCol))
    val margin = aggregate(toks, lit(model.intercept),
      (acc, t) => acc + element_at(w, featureIdx(t, model.dim) + 1))
    docs
      .select(col(idCol).as("id"),
        size(toks).cast("long").as("n_tokens"),
        margin.as("margin"))
      .select(col("id"), col("n_tokens"), col("margin"),
        (lit(1.0) / (lit(1.0) + exp(-col("margin")))).as("quality_score"))
      .withColumn("keep", col("quality_score") >= threshold)
  }
}
