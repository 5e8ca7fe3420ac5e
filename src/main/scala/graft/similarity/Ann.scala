package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * [[knnBrute]] is the correctness baseline: broadcast the (small)
  * query set over the corpus scan, score every pair with the codegen'd
  * [[graft.functions.CosineSimilarity]], keep top-k per query with one
  * bounded window. Cost is |corpus|×|queries| similarity evaluations —
  * exact, and the oracle for the approximate path.
  *
  * [[knnLsh]] is the scale path: random-hyperplane signatures bucket
  * vectors by sign patterns; only candidates sharing a band with the
  * query are scored. Planes derive from a seeded RNG, so signatures are
  * deterministic. Recall/pruning trade off via (bands × bitsPerBand) —
  * tight near-neighbors (the dedup use-case) survive small bands with
  * high probability; orthogonal noise does not.
  */
object Ann {

  /** Top-k exact cosine neighbors per query.
    * → (query_id, neighbor_id, cosine, rank). Cosine is rounded to
    * `roundTo` decimals BEFORE ranking (with neighbor id as tiebreak)
    * so rankings are reproducible across engines/summation orders. */
  def knnBrute(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cvec"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosineSim(col("_qvec"), col("_cvec")), roundTo))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic Gaussian hyperplanes: bands × bitsPerBand planes of
    * `dim` weights each. */
  def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Band bit-width sized to the corpus — the acoustic-banding (q144)
    * lesson generalized to the embedding family: with FIXED bits, a
    * random (band, sig) bucket holds ~n/2^bits vectors, so candidate
    * pairs grow n²·bands/2^(bits+1) — QUADRATIC in the corpus. The
    * r19 second-decade gate measured the failure on 4×16-bit banding
    * at 500k docs: 25× wall growth for 10× docs, all of it in the
    * candidate verify. Keeping buckets near-singleton needs
    * `bits ≈ log2(n) + slack`: expected random collisions per band
    * then stay ≤ n/2^(slack+1) — linear by construction, with `bands`
    * as the recall dial that only multiplies candidates by a constant.
    *
    * Recall trade, stated plainly (the q144 stance): raising bits
    * prunes harder at the threshold BOUNDARY. A pair at cosine c
    * agrees per bit with p = 1 − arccos(c)/π, so at 21 bits / 4 bands
    * a 0.98-cosine pair survives with p ≈ 0.69 while the true
    * near-dup regime this family exists for (c ≥ 0.999, the planted-
    * dup / re-crawl shape) survives with p ≥ 0.995. Buy boundary
    * recall back with more `bands` (linear cost), never with fewer
    * bits (quadratic cost). Floor 16 = the q93 simhash band width. */
  def lshBitsForCorpus(expectedDocs: Long, floor: Int = 16, slack: Int = 2): Int = {
    require(expectedDocs > 0, s"corpus size must be positive: $expectedDocs")
    val need = math.ceil(math.log(expectedDocs.toDouble) / math.log(2.0)).toInt + slack
    math.max(floor, need).min(30) // sig is an int; 30 bits ≈ 1B-doc corpora
  }

  /** Per-band sign-pattern signatures → (id, [carryCols…,] vec, band,
    * sig). All band signatures come from ONE fused pass of the native
    * [[graft.functions.BandSigs]] kernel (whole-stage codegen; the
    * higher-order `aggregate` formulation it replaces ran one
    * interpreted fold per hyperplane — bands × bitsPerBand × dim lambda
    * dispatches per row, the q117 defect class; r20, guide §4) —
    * no explode of the vector, no shuffle; banding stays a narrow
    * projection. Bit-identical to the HOF twin
    * ([[bandSignaturesHof]], SimilaritySpec pins it): same
    * left-to-right dot accumulation, same `dot > 0` bit, same integer
    * signature sum, same all-zero signatures for null/short/null-
    * element vectors. `carryCols` ride along unchanged (the
    * [[semanticDedupPairs]] cell key). */
  def bandSignatures(
      df: DataFrame, idCol: String, vecCol: String,
      bands: Int, bitsPerBand: Int, dim: Int, seed: Long = 42L,
      carryCols: Seq[String] = Nil): DataFrame = {
    val flat = planes(dim, bands * bitsPerBand, seed).flatten.toArray
    // NULL vector → the all-zero signatures the HOF's
    // when(null > 0, 1).otherwise(0) bits produced
    val sigs = coalesce(
      graft.functions.BandSigs.sigs(col(vecCol), flat, bands, bitsPerBand, dim),
      array((0 until bands).map(_ => lit(0)): _*))
    val carried = carryCols.map(col)
    df.select(col(idCol).as("id") +: carried :+ col(vecCol).as("vec") :+
        sigs.as("_sigs"): _*)
      .select((col("id") +: carried :+ col("vec")) :+
        posexplode(col("_sigs")).as(Seq("band", "sig")): _*)
  }

  /** The column-algebra twin of [[bandSignatures]] — one interpreted
    * `aggregate` fold per hyperplane. Kept as the SPEC TWIN that pins
    * the [[graft.functions.BandSigs]] kernel bit-for-bit (the
    * [[graft.text.LangId.marginsHof]] discipline), and as the
    * reference formulation for engines without expression extension
    * points. */
  private[graft] def bandSignaturesHof(
      df: DataFrame, idCol: String, vecCol: String,
      bands: Int, bitsPerBand: Int, dim: Int, seed: Long = 42L,
      carryCols: Seq[String] = Nil): DataFrame = {
    val ps = planes(dim, bands * bitsPerBand, seed)
    def bit(p: Array[Double]): Column = {
      val dot = aggregate(
        sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, i) => acc + element_at(col(vecCol), i + 1) * element_at(lit(p), i + 1))
      when(dot > 0, 1).otherwise(0)
    }
    val bandCols = (0 until bands).map { b =>
      val sig = (0 until bitsPerBand)
        .map(j => bit(ps(b * bitsPerBand + j)) * (1 << j))
        .reduce(_ + _)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val carried = carryCols.map(col)
    df.select(col(idCol).as("id") +: carried :+ col(vecCol).as("vec") :+
        explode(array(bandCols: _*)).as("_b"): _*)
      .select(col("id") +: carried :+ col("vec") :+
        col("_b.band").as("band") :+ col("_b.sig").as("sig"): _*)
  }

  /** Rows the driver-local k-means fit accepts before falling back to
    * MLlib's distributed fit — the [[graft.text.LogitFit]] stance: a
    * coarse quantizer is routinely trained on a bounded sample (FAISS
    * trains IVF on ~256·k vectors), and for a bounded corpus MLlib's
    * kmeans|| init + Lloyd rounds are ~25 sequential Spark jobs whose
    * scheduling overhead dwarfs the arithmetic (measured 2.4 s of
    * q136's 4.3 s wall for 2 000 × 64-dim vectors at sf0.1; the local
    * fit is < 10 ms). 65536 × 64 doubles ≈ 33 MB collected. */
  val KMeansMaxDriverRows = 65536

  /** IVF (inverted-file) index: a k-means coarse quantizer assigns
    * every corpus vector to its nearest centroid once at build time.
    * Queries then probe only the `nprobe` nearest cells — candidate
    * count is (nprobe/k)·corpus instead of corpus. Centroids are model
    * metadata (k × dim doubles), legitimately driver-held. Corpora
    * within [[KMeansMaxDriverRows]] fit on the DRIVER (deterministic
    * seeded k-means++ init + Lloyd sweeps, r20 — see the bound's
    * scaladoc); larger corpora keep MLlib's distributed fit. Both
    * paths feed the same exact [[ivfAssign]], so the index contract
    * (deterministic assignment, incremental-append equivalence) is
    * path-independent; the centers themselves differ between the two
    * fits (cell IDENTITY is arbitrary in any k-means — only
    * assignment quality is contracted, SimilaritySpec's planted-
    * cluster gates).
    * → (indexed corpus with `cluster`, centroid array) */
  def ivfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    // ONE bounded job decides the path AND feeds the local fit (the
    // LogitFit limit(bound+1) stance)
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(KMeansMaxDriverRows + 1).collect()
    // k-means cannot fit zero rows: the empty index is one empty cell,
    // so probes join nothing and yield nothing
    if (sample.isEmpty)
      return (corpus.withColumn("cluster", lit(0)), Array(Array(0.0)))
    val centers =
      if (sample.length <= KMeansMaxDriverRows)
        LocalKMeans.fit(sample.map(_.getSeq[Double](0).toArray), k, seed)
      else {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val feat = corpus.select(
          array_to_vector(col(vecCol).cast("array<double>")).as("_features"))
        val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("_features")
          .setPredictionCol("cluster").fit(feat)
        model.clusterCenters.map(_.toArray)
      }
    // assign with the SAME exact sum-of-squares argmin [[ivfAssign]]
    // uses (r17 advice): model.transform's fastSquaredDistance takes
    // norm-based shortcuts that can flip near-equidistant ties, which
    // would make the incremental-append equivalence probabilistic
    // instead of exact-by-construction
    (ivfAssign(corpus.select(col(idCol), col(vecCol)), idCol, vecCol, centers), centers)
  }

  /** Squared L2 distance of a vector column to a centroid literal —
    * the codegen'd [[graft.functions.SquaredDistance]] kernel (the
    * `aggregate` higher-order formulation is a CodegenFallback whose
    * interpreted lambda measured 2× on the q96a build path). */
  private def distSq(vec: Column, center: Array[Double]): Column =
    graft.functions.SquaredDistance.sqDist(vec, lit(center))

  /** IVF approximate top-k: each query probes its `nprobe` nearest
    * cells; only corpus vectors in those cells are scored. The probe
    * selection is a per-row array sort over k centroid distances —
    * pure column expressions, fully distributed. */
  def knnIvf(
      indexedCorpus: DataFrame, centers: Array[Array[Double]],
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, roundTo: Int = 4): DataFrame = {
    require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
    // an index may carry fewer cells than requested probes (a tiny or
    // empty corpus) — probing every cell is then the exact semantics
    val np = math.min(nprobe, centers.length)
    val cellDists = array(centers.zipWithIndex.map { case (ctr, j) =>
      struct(distSq(col(vecCol), ctr).as("d"), lit(j).as("cell"))
    }: _*)
    val probes = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("_qvec"),
      explode(slice(array_sort(cellDists), 1, np)).as("_p"))
      .select(col("query_id"), col("_qvec"), col("_p.cell").as("cluster"))
    // No pair dedup needed, unlike the LSH paths: a corpus vector is
    // assigned to exactly ONE cell, so a (query, neighbor) pair can
    // arise from at most one probed cluster — the banding multiplicity
    // that forces dropDuplicates in knnLsh/cosineNearDupLsh cannot
    // occur, and skipping it removes a wide shuffle that carried both
    // vectors per candidate row (r11). Requires unique ids per input
    // (the family's primary-key contract, see cosineNearDupLsh) —
    // duplicate input rows are the caller's data bug, not banding.
    val candidates = indexedCorpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cvec"), col("cluster"))
      .join(probes, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("cosine", round(cosineSim(col("_qvec"), col("_cvec")), roundTo))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Exact embedding near-dup PAIRS: every (id_1 < id_2) pair with
    * cosine ≥ threshold. O(n²) similarity evaluations — the semantics
    * baseline and oracle for [[cosineNearDupLsh]], same division of
    * labor as exact Jaccard (q91) vs MinHash+LSH (q92). Run it on a
    * sample or a single shard; never on the corpus. */
  def cosineNearDupBrute(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 4): DataFrame = {
    val a = df.select(col(idCol).as("id_1"), col(vecCol).as("_v1"))
    val b = df.select(col(idCol).as("id_2"), col(vecCol).as("_v2"))
    a.crossJoin(broadcast(b)) // oracle-scale input: one side fits by contract
      .filter(col("id_1") < col("id_2"))
      .withColumn("cosine", round(cosineSim(col("_v1"), col("_v2")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_1", "id_2", "cosine")
  }

  /** Scale path for embedding near-dup pairs: hyperplane band buckets
    * generate candidates (vectors sharing ≥1 of `bands` sign-pattern
    * signatures — one shuffle on (band, sig), bucket-bounded fan-out),
    * then the exact codegen'd cosine verifies each candidate once.
    * Recall is a function of the true cosine: a 0.95-cosine pair
    * survives 4×4-bit banding with p ≈ 0.99 (each bit agrees with
    * p = 1 − θ/π ≈ 0.9), which is exactly the near-DUPLICATE regime
    * this exists for; distant pairs are pruned, which is the point.
    * Output feeds [[graft.dedup.TextDedup.dedupClusters]] unchanged
    * for embedding-level corpus dedup.
    *
    * GEOMETRY IS A SCALE CONTRACT, not a tuning nicety: the defaults
    * serve small recall-gated fixtures; at corpus scale `bitsPerBand`
    * MUST grow with log2(corpus) ([[lshBitsForCorpus]]) or random
    * band collisions — n²·bands/2^(bits+1) of them — swamp the verify
    * step (the r19 xl gate measured 25× wall growth for 10× docs at a
    * fixed 16-bit width on 500k docs). Buy recall with `bands`
    * (linear), never with under-sized bits (quadratic).
    *
    * `df` is referenced three times (signature build + one vector
    * re-attach per pair side) — fine for a deterministic source read
    * (scans are pruned to id+vector); a caller holding an expensive
    * or non-deterministic upstream should persist it first.
    *
    * `idCol` is the corpus PRIMARY KEY and must be unique per row —
    * duplicate ids multiply the re-attach joins' output (the exact
    * brute path emits duplicate pairs under the same input, so this
    * is the family contract, not a path quirk); dedup the corpus
    * first ([[graft.medallion.Silver.dedup]]). */
  def cosineNearDupLsh(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    // The signature lineage (bands × bitsPerBand hyperplane dots per
    // vector) feeds BOTH sides of the band self-join, and the planner
    // broadcasts one side — a BroadcastExchange and a shuffle Exchange
    // never canonicalize equal, so ReusedExchange cannot collapse the
    // duplication and every plane dot runs twice (verified in the
    // formatted plan: two Scan parquet subtrees). Same fix as q93's
    // simhashNearPairs: materialize once into executor-local blocks.
    //
    // LEAN payload (round 11): the materialized signatures carry NO
    // vector — (id, band, sig) is three small ints per row, so the
    // checkpoint blocks, the (band, sig) exchange and the pair-dedup
    // shuffle move kilobytes where the previous shape moved the
    // vector ×bands (dim floats duplicated per band, then TWO vectors
    // per candidate row through dropDuplicates). Vectors re-attach by
    // id for the verify step only — at sf0.1 the planner broadcasts
    // the embedding side; at cluster scale they become id-keyed
    // shuffle joins that move each vector exactly once per side,
    // independent of `bands`. Measured at sf0.1 (r11): focused
    // steady-state q116a 2.97 → 0.97 s, q116b 1.51 → 1.13 s; the
    // full-suite interleaved mins (the bench statistic) moved
    // 2.28 → 1.19 s and 2.19 → 1.64 s across two quiet-host runs —
    // the drift family's block-manager pressure WAS the vector
    // payload, now gone.
    val sig = bandSignatures(df, idCol, vecCol, bands, bitsPerBand, dim, seed)
      .select("id", "band", "sig")
      .localCheckpoint(true)
    val cand = sig.toDF("id_1", "band", "sig")
      .join(sig.toDF("id_2", "band", "sig"), Seq("band", "sig"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")
    cand
      .join(df.select(col(idCol).as("id_1"), col(vecCol).as("_v1")), Seq("id_1"))
      .join(df.select(col(idCol).as("id_2"), col(vecCol).as("_v2")), Seq("id_2"))
      .withColumn("cosine", round(cosineSim(col("_v1"), col("_v2")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_1", "id_2", "cosine")
  }

  /** End-to-end embedding-level near-dup REMOVAL: LSH pair generation →
    * connected components → keep the minimum-id row per cluster — the
    * embedding-space mirror of
    * [[graft.dedup.TextDedup.removeNearDuplicates]] (crawl corpora
    * carry both text-level and representation-level duplicates; the
    * second kind survives text dedup when boilerplate differs). */
  def removeNearDuplicateEmbeddings(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    val pairs = cosineNearDupLsh(df, idCol, vecCol, threshold, dim, bands, bitsPerBand, seed)
    val clusters = graft.dedup.TextDedup.dedupClusters(pairs, df.select(col(idCol).as("id")))
    df.join(clusters.filter(col("id") === col("cluster_id")).select(col("id").as(idCol)), Seq(idCol))
  }

  /** Within-cell near-dup PAIRS for [[semanticDedup]]: `indexed` must
    * carry a `cluster` column (an [[ivfIndex]] assignment, or any
    * caller-supplied partition of the corpus). Identical to
    * [[cosineNearDupLsh]] except the candidate join keys on
    * (cluster, band, sig) — STRICTLY finer buckets, so a pair in
    * different cells can never become a candidate, by construction
    * rather than by filter (SimilaritySpec pins this with an
    * adversarial assignment that splits a true near-pair across
    * cells). Same lean-payload shape: the checkpoint and both
    * shuffles move (id, cluster, band, sig) ints only; vectors
    * re-attach by id from `indexed` itself for the verify score.
    * `idCol` unique per row — the family contract. */
  def semanticDedupPairs(
      indexed: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    val sig = bandSignatures(indexed, idCol, vecCol, bands, bitsPerBand, dim, seed,
        carryCols = Seq("cluster"))
      .select("id", "cluster", "band", "sig")
      .localCheckpoint(true)
    val cand = sig.toDF("id_1", "cluster", "band", "sig")
      .join(sig.toDF("id_2", "cluster", "band", "sig"), Seq("cluster", "band", "sig"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .dropDuplicates("id_1", "id_2")
    cand
      .join(indexed.select(col(idCol).as("id_1"), col(vecCol).as("_v1")), Seq("id_1"))
      .join(indexed.select(col(idCol).as("id_2"), col(vecCol).as("_v2")), Seq("id_2"))
      .withColumn("cosine", round(cosineSim(col("_v1"), col("_v2")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_1", "id_2", "cosine")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): k-means cells
    * bound the search space, near-duplicate detection runs WITHIN each
    * cell only, and one representative (minimum id) survives per
    * duplicate cluster. The published recipe compares all pairs inside
    * a cell; here the within-cell probe itself is LSH-bucketed
    * ([[semanticDedupPairs]]) so a hot cell — k-means balance is not
    * guaranteed on crawl data — still never goes all-pairs: candidate
    * buckets are (cluster, band, sig), bounded by both keys. The
    * documented approximation is inherited from the paper: a
    * near-duplicate pair straddling a cell boundary is not examined
    * (SemDeDup accepts this for the ~k× candidate reduction; raise
    * `kCells` recall by lowering it, or run [[cosineNearDupLsh]] when
    * cross-cell pairs matter). Composition:
    * [[ivfIndex]] → [[semanticDedupPairs]] →
    * [[graft.dedup.TextDedup.dedupClusters]] → keep cluster minima.
    * → the kept rows of `df`, schema unchanged. */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      kCells: Int, threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    val (indexed, _) = ivfIndex(df, idCol, vecCol, kCells, seed)
    val pairs = semanticDedupPairs(indexed, idCol, vecCol, threshold, dim,
      bands, bitsPerBand, seed)
    val clusters = graft.dedup.TextDedup.dedupClusters(pairs, df.select(col(idCol).as("id")))
    df.join(clusters.filter(col("id") === col("cluster_id")).select(col("id").as(idCol)), Seq(idCol))
  }

  /** Opt-in QUANTIZED near-dup pairs: the corpus rides the banding
    * shuffle as int8 codes — 4× fewer bytes through the exchange, the
    * whole point of [[Quantize]] at 100 TB. Correctness comes cheap
    * because every stage is per-vector-scale-invariant: hyperplane
    * signs are unchanged by a positive scale (sign(codes·h) =
    * sign(v·h)), and cosine's normalization cancels the scales, so the
    * verification runs the codegen'd int8 kernel directly. The only
    * approximation is rounding to 127 levels — a near-zero hyperplane
    * dot or a threshold-straddling cosine can flip, which is the
    * ≤ 0.02-recall trade SimilaritySpec gates on the real embeddings
    * table. */
  def cosineNearDupLshQuantized(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    // quantize BEFORE the banding pipeline: Catalyst keeps the code
    // projection below the (band, sig) exchange, so the shuffle moves
    // tinyint arrays
    val codes = df.select(col(idCol),
      Quantize.quantize(col(vecCol)).getField("codes").as(vecCol))
    cosineNearDupLsh(codes, idCol, vecCol, threshold, dim, bands, bitsPerBand, seed, roundTo)
  }

  /** Opt-in quantized IVF probe: the CORPUS side of the candidates
    * join ships int8 codes (the big side — queries stay float because
    * centroid L2 distance is NOT scale-invariant, and the mixed
    * float×int8 cosine is exact up to code rounding: the corpus scale
    * cancels in its own norm). Index build ([[ivfIndex]]) stays on the
    * original floats. */
  def knnIvfQuantized(
      indexedCorpus: DataFrame, centers: Array[Array[Double]],
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int, roundTo: Int = 4): DataFrame =
    knnIvf(
      indexedCorpus.withColumn(vecCol, Quantize.quantize(col(vecCol)).getField("codes")),
      centers, queries, idCol, vecCol, k, nprobe, roundTo)

  /** Persisted LSH signature store for the embedding family — the
    * q123/q146 incremental contract's missing member (r16 verdict #4):
    * (id, band, sig) rows, one per (vector, band), computed ONCE and
    * appended per crawl batch so the daily near-dup probe never
    * re-signs the historical corpus (the hyperplane dots over 100 TB
    * are exactly the work [[cosineNearDupLsh]] re-spends per run).
    * Same (bands, bitsPerBand, dim, seed) must be used for every
    * batch signed into one store — the planes ARE the index identity. */
  def signatureStore(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L): DataFrame =
    bandSignatures(df, idCol, vecCol, bands, bitsPerBand, dim, seed)
      .select("id", "band", "sig")

  /** Fold a batch's signatures into a [[signatureStore]] with NEW-WINS
    * semantics on re-crawled ids: every store row of an id present in
    * the batch is dropped before the union, so a re-embedded document
    * carries exactly one signature set — the fresh one (the q146
    * staleness rule). The anti-join's build side is the batch's ids,
    * small by the incremental contract → broadcast hash anti-join, no
    * store-wide shuffle. */
  def mergeSignatureStore(store: DataFrame, batchSigs: DataFrame): DataFrame =
    store.join(broadcast(batchSigs.select("id").distinct()), Seq("id"), "left_anti")
      .unionByName(batchSigs)

  /** Merge-on-read NEW-WINS compaction for an APPEND-ONLY store: each
    * crawl batch appends its rows tagged with a batch ordinal in
    * `batchCol`, and a read keeps only each id's LATEST append — the
    * [[mergeSignatureStore]] staleness rule replayed at read time, so
    * the store stays a pile of immutable appends under the streamed
    * loop (the webgraph `compactAdjacency` stance, resolved by
    * recency instead of addition). One id-keyed window — a single
    * hash shuffle on `idCol` at cluster scale, no global order.
    * Generic over the id column so the embedding table itself (the
    * other per-id store the crawl loop maintains) compacts with the
    * same rule. `batchCol` is dropped from the output — the result is
    * shaped exactly like a fresh single-batch store. */
  def compactNewWins(store: DataFrame, idCol: String, batchCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
    store.withColumn("_latest", max(col(batchCol)).over(w))
      .filter(col(batchCol) === col("_latest"))
      .drop("_latest", batchCol)
  }

  /** Incremental embedding near-dup: detect pairs between a NEW batch
    * and an already-signed corpus — the daily-crawl shape for the
    * embedding family, mirroring
    * [[graft.dedup.TextDedup.incrementalNearDups]] (MinHash) and the
    * q146 fingerprint store. The band join is ASYMMETRIC: the batch's
    * signature rows probe the merged store's, so old×old pairs are
    * never generated — candidate work scales with |batch| · collision
    * rate, not |corpus|². Re-crawled ids take the batch's fresh
    * signature AND vector (new-wins, [[mergeSignatureStore]]).
    *
    * Verification is EXACT: candidate pairs re-attach vectors by id —
    * batch vectors from `newBatch`, historical ones from `corpusVecs`
    * (the persisted embedding table; in a lakehouse the embeddings ARE
    * already a store, so this reads what exists — only the signature
    * work is saved, which is the expensive term). The id-keyed attach
    * joins touch candidate rows only; at cluster scale they are hash
    * joins moving each candidate vector once. → (id_1, id_2, cosine),
    * every pair involving ≥1 batch id. */
  def incrementalCosineNearDups(
      newBatch: DataFrame, idCol: String, vecCol: String,
      oldSigs: DataFrame, corpusVecs: DataFrame,
      threshold: Double, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    require(Seq("id", "band", "sig").forall(oldSigs.columns.contains),
      "oldSigs must carry (id, band, sig) — a signatureStore output")
    // bind the store's columns BY NAME (r17 advice): a caller's
    // select("band","sig","id") passes the require above, and a
    // positional toDF would silently join id-against-band
    val storeSigs = oldSigs.select(col("id"), col("band"), col("sig"))
    // the batch's signature pipeline feeds the probe AND the merge —
    // small by contract, materialize once (the incrementalNearDups
    // checkpoint discipline)
    val newSigs = signatureStore(newBatch, idCol, vecCol, dim, bands, bitsPerBand, seed)
      .localCheckpoint(true)
    val all = mergeSignatureStore(storeSigs, newSigs)
    val cand = newSigs.toDF("_ida", "band", "sig")
      .join(all.select(col("id").as("_idb"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("_ida") =!= col("_idb"))
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"))
      .dropDuplicates("id_1", "id_2")
    // new-wins vector attach: batch vectors shadow corpus rows of the
    // same id (broadcast anti-join on the batch's ids, as above)
    val vecs = corpusVecs.select(col(idCol).as("id"), col(vecCol).as("_v"))
      .join(broadcast(newBatch.select(col(idCol).as("id")).distinct()), Seq("id"), "left_anti")
      .unionByName(newBatch.select(col(idCol).as("id"), col(vecCol).as("_v")))
    cand
      .join(vecs.toDF("id_1", "_v1"), Seq("id_1"))
      .join(vecs.toDF("id_2", "_v2"), Seq("id_2"))
      .withColumn("cosine", round(cosineSim(col("_v1"), col("_v2")), roundTo))
      .filter(col("cosine") >= threshold)
      .select("id_1", "id_2", "cosine")
  }

  /** Assign vectors to FROZEN centroids — the incremental half of the
    * IVF contract (r16 verdict #4): a crawl batch joins an existing
    * index WITHOUT re-clustering the corpus (k-means refit over 100 TB
    * per batch is the thing to avoid; periodic offline refits are a
    * separate, bounded decision). [[ivfIndex]] assigns with this very
    * expression after fitting (same exact sum-of-squares argmin,
    * smallest distance, ties to the lowest cell index), so
    * `ivfAssign(batch, centers)` rows appended to the old indexed
    * corpus ARE the index [[ivfIndex]] would have built had the batch
    * been present — exact by construction, spec-pinned — and
    * [[knnIvf]] reads the merged frame unchanged. Pure column expressions: one narrow projection, no
    * shuffle, no driver loop. */
  def ivfAssign(
      batch: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Double]]): DataFrame = {
    require(centers.nonEmpty, "ivfAssign needs at least one centroid")
    // argmin as a least() chain over (d, cell) structs — the same
    // lexicographic tie rule array_sort's head would give, without
    // allocating and sorting a k-array per row
    val cellDists = centers.zipWithIndex.map { case (ctr, j) =>
      struct(distSq(col(vecCol), ctr).as("d"), lit(j).as("cell"))
    }
    val best = if (cellDists.length == 1) cellDists.head else least(cellDists: _*)
    batch.withColumn("cluster", best.getField("cell"))
  }

  /** Approximate top-k: score only corpus vectors sharing ≥1 band
    * signature with the query. One shuffle on (band, sig); candidate
    * count per query is bucket-bounded, not corpus-bounded. `idCol`
    * must be unique within each input (primary keys — the
    * [[cosineNearDupLsh]] family contract).
    *
    * Same LEAN-payload shape as [[cosineNearDupLsh]]: the (band, sig)
    * bucket join and the candidate dedup move ids only — corpus
    * vectors would otherwise ride the band explode ×bands and every
    * candidate row twice. Vectors re-attach by id for the verify
    * score: one id-keyed join per side, each vector moved once,
    * independent of `bands`. */
  def knnLsh(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      bands: Int = 4, bitsPerBand: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    val cSig = bandSignatures(corpus, idCol, vecCol, bands, bitsPerBand, dim, seed)
      .select("id", "band", "sig").toDF("neighbor_id", "band", "sig")
    val qSig = bandSignatures(queries, idCol, vecCol, bands, bitsPerBand, dim, seed)
      .select("id", "band", "sig").toDF("query_id", "band", "sig")
    val candidates = cSig.join(qSig, Seq("band", "sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec")), Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cvec")), Seq("neighbor_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("cosine", round(cosineSim(col("_qvec"), col("_cvec")), roundTo))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
