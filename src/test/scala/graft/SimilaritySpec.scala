package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim
import graft.similarity.Ann

/** CosineSimilarity expression (interpreted + codegen) and LSH ANN
  * recall vs the brute-force baseline.
  */
class SimilaritySpec extends SparkSpec {

  test("cosineSim: known values, zero norm, codegen plan") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0) // zero norm -> 0.0
    ).toDF("a", "b", "expected")
    val rows = df.select(cosineSim(col("a"), col("b")).as("c"), col("expected")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // stays inside whole-stage codegen over a real scan (a local
    // relation would constant-fold before codegen could apply)
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb.select(cosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; our Project must be inside one
    assert(plan.contains("*(1) Project [cosine_similarity"), plan)
  }

  test("cosineSim null propagation and double arrays") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(cosineSim(col("a"), col("b"))).head().isNullAt(0))
  }

  test("sqDist: known values, float-vs-double-literal mix, codegen plan, null propagation") {
    import graft.functions.SquaredDistance.sqDist
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0, 0.0), 0.0),
      (Array(1.0f, 0.0f), Array(0.0, 1.0), 2.0),
      (Array(1.0f, 2.0f), Array(4.0, 6.0), 25.0),
      (Array(-1.0f, -2.0f), Array(1.0, 2.0), 20.0)
    ).toDF("a", "b", "expected")
    df.select(sqDist(col("a"), col("b")).as("d"), col("expected")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // the IVF probe shape: vector column vs centroid literal must stay
    // inside whole-stage codegen over a real scan
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb.select(sqDist(col("embedding"), lit(Array.fill(8)(0.5))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [squared_distance"), plan)
    val nulls = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    assert(nulls.select(sqDist(col("a"), col("b"))).head().isNullAt(0))
    // dimension mismatch is NULL, not a confident prefix distance (the
    // IVF argmin consumes these — r18 advice): interpreted path via the
    // local relation, codegen path via a real scan vs a short literal
    val mismatch = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(mismatch.select(sqDist(col("a"), col("b"))).head().isNullAt(0))
    val shortLit = emb.select(sqDist(col("embedding"), lit(Array.fill(7)(0.5))).as("d"))
    assert(shortLit.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(shortLit.head().isNullAt(0))
  }

  test("LSH ANN: perfect recall on planted near-neighbors with real pruning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val base = (0L until 50L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    // plant: for each of 10 query vectors, a jittered copy (cosine ~0.99)
    val planted = (0L until 10L).map { i =>
      (1000L + i) -> base(i.toInt)._2.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val queries = base.take(10).toDF("vec_id", "embedding")

    val brute = Ann.knnBrute(corpus, queries, "vec_id", "embedding", k = 1)
    val lsh = Ann.knnLsh(corpus, queries, "vec_id", "embedding", k = 1, dim = dim,
      bands = 4, bitsPerBand = 4)

    val bTop = brute.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lTop = lsh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the planted jittered copy is every query's true top-1
    (0L until 10L).foreach(i => assert(bTop(i) == 1000L + i))
    val recall = (0L until 10L).count(i => lTop.get(i).contains(1000L + i)) / 10.0
    assert(recall >= 0.9, s"recall $recall")
  }

  test("cosine near-dup pairs: brute = ground truth, LSH recalls planted dups, prunes noise") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val base = (0L until 60L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    // plant 12 jittered near-duplicates (cosine ~0.99)
    val planted = (0L until 12L).map { i =>
      (1000L + i) -> base(i.toInt)._2.map(x => x + 0.04f * rnd.nextGaussian().toFloat)
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val brute = Ann.cosineNearDupBrute(corpus, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exactly the planted pairs
    assert(brute == (0L until 12L).map(i => (i, 1000L + i)).toSet)
    val lsh = Ann.cosineNearDupLsh(corpus, "vec_id", "embedding", threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH verify must never emit a below-threshold pair")
    assert(lsh.size >= 11, s"recall ${lsh.size}/12") // ≥~0.99^12 expected survival
    // feeds cluster resolution unchanged: each dup pair collapses to min id
    val pairs = Ann.cosineNearDupLsh(corpus, "vec_id", "embedding", threshold = 0.9, dim = dim)
    val clusters = graft.dedup.TextDedup.dedupClusters(
      pairs, corpus.select(col("vec_id").as("id")))
    val byCluster = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lsh.foreach { case (a, b) => assert(byCluster(b) == byCluster(a)) }
    // end-to-end removal: exactly one survivor (the min id) per dup pair
    val kept = Ann.removeNearDuplicateEmbeddings(
      corpus, "vec_id", "embedding", threshold = 0.9, dim = dim)
      .collect().map(_.getLong(0)).toSet
    lsh.foreach { case (a, b) => assert(kept(a) && !kept(b), s"pair ($a,$b)") }
    assert(kept.size == 72 - lsh.size)
    // the r11 LEAN invariant: the materialized signature blocks (the
    // plan's LogicalRDD leaves) carry (id, band, sig) ONLY — a vector
    // column reappearing there means embeddings are riding the
    // checkpoint ×bands and the bucket/dedup shuffles again
    val rddLeaves = pairs.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.schema.fieldNames.toSeq
    }
    assert(rddLeaves.nonEmpty && rddLeaves.forall(_ == Seq("id", "band", "sig")),
      s"signature checkpoint must be payload-lean, got schemas: $rddLeaves")
  }

  test("IVF ANN: planted near-neighbors recovered with bounded probing") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val base = (0L until 60L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val planted = (0L until 10L).map { i =>
      (2000L + i) -> base(i.toInt)._2.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val queries = base.take(10).toDF("vec_id", "embedding")

    val (indexed, centers) = Ann.ivfIndex(corpus, "vec_id", "embedding", k = 8)
    assert(centers.length == 8 && centers.head.length == dim)
    // a jittered copy lands in the same (or adjacent) cell as its
    // original; nprobe=2 must recover it as top-1
    val ivf = Ann.knnIvf(indexed, centers, queries, "vec_id", "embedding", k = 1, nprobe = 2)
    val top = ivf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = (0L until 10L).count(i => top.get(i).contains(2000L + i)) / 10.0
    assert(recall >= 0.9, s"IVF recall $recall")
    // probing is genuinely bounded: candidates < corpus for nprobe < k
    val probedCells = indexed.groupBy("cluster").count().count()
    assert(probedCells > 2, "quantizer must spread the corpus over cells")
    // the invariant behind knnIvf carrying NO pair-dedup shuffle (r11):
    // one cell per corpus vector means a (query, neighbor) pair can
    // arise from at most one probed cluster — no duplicates, by plan
    val multi = Ann.knnIvf(indexed, centers, queries, "vec_id", "embedding",
      k = 5, nprobe = 4)
    assert(multi.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).isEmpty,
      "knnIvf must never emit a (query, neighbor) pair twice")
  }

  test("incrementalCosineNearDups: batch-restricted equivalence with the full LSH run; old-times-old never generated") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 16
    val base = (0L until 60L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    // plant near-dups BOTH ways: batch→history (found) and
    // history→history (must NOT appear — old×old is out of contract)
    val histDup = (3000L, base(5)._2.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    val batchDups = (0L until 8L).map { i =>
      (4000L + i) -> base(i.toInt)._2.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
    }
    val hist = (base :+ histDup).toDF("vec_id", "embedding")
    val batch = batchDups.toDF("vec_id", "embedding")
    val store = Ann.signatureStore(hist, "vec_id", "embedding", dim)
    val inc = Ann.incrementalCosineNearDups(batch, "vec_id", "embedding",
      store, hist, threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // equivalence: the full-corpus LSH run restricted to batch-touching
    // pairs — same planes, same verify, so SET equality, not just recall
    val batchIds = batchDups.map(_._1).toSet
    val full = Ann.cosineNearDupLsh(
      hist.unionByName(batch), "vec_id", "embedding", threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full.filter(p => batchIds(p._1) || batchIds(p._2)))
    // the planted history-only pair exists in the full run but is not
    // the incremental path's to re-derive (old x old never generated)
    assert(full.contains((5L, 3000L)) && !inc.contains((5L, 3000L)))
    assert(inc.size >= 7, s"batch recall ${inc.size}/8")
  }

  test("incrementalCosineNearDups: a re-crawled id takes its NEW signature and vector (staleness rule)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 16
    val base = (0L until 40L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val hist = base.toDF("vec_id", "embedding")
    val store = Ann.signatureStore(hist, "vec_id", "embedding", dim)
    // id 7 re-crawls with a COMPLETELY NEW vector that near-dups id 20;
    // its old vector did not (and its old signature rows must not leak
    // stale candidates or stale cosines)
    val newVec7 = base(20)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val batch = Seq(7L -> newVec7).toDF("vec_id", "embedding")
    val got = Ann.incrementalCosineNearDups(batch, "vec_id", "embedding",
      store, hist, threshold = 0.9, dim = dim)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set((7L, 20L)), got.keySet.toString)
    // the emitted cosine is the NEW vector's (≈0.999+), not the old
    // random one's (≈0 — below any threshold)
    assert(got((7L, 20L)) >= 0.99)
  }

  test("ivfAssign: frozen-centroid assignment replays the fitted model; merged incremental index serves knnIvf") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val dim = 16
    val base = (0L until 60L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val hist = base.toDF("vec_id", "embedding")
    val (indexedHist, centers) = Ann.ivfIndex(hist, "vec_id", "embedding", k = 8)
    // transform-equivalence: ivfAssign with the fitted centers lands
    // every historical vector in the cell the model itself assigned
    val replayed = Ann.ivfAssign(hist, "vec_id", "embedding", centers)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fitted = indexedHist.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(replayed == fitted)
    // incremental flow: a batch of jittered copies assigns to FROZEN
    // centroids (no refit), appends to the index, and knnIvf recovers
    // each planted neighbor from the merged frame
    val batch = (0L until 10L).map { i =>
      (5000L + i) -> base(i.toInt)._2.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
    }.toDF("vec_id", "embedding")
    val merged = indexedHist.unionByName(
      Ann.ivfAssign(batch, "vec_id", "embedding", centers))
    val queries = base.take(10).toDF("vec_id", "embedding")
    val top = Ann.knnIvf(merged, centers, queries, "vec_id", "embedding", k = 1, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = (0L until 10L).count(i => top.get(i).contains(5000L + i)) / 10.0
    assert(recall >= 0.9, s"incremental IVF recall $recall")
  }

  test("quantized ANN: the 4x-shuffle-saving paths cost <= 0.02 recall on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_1", "id_2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.cosineNearDupLsh(emb, "vec_id", "embedding", 0.35, dim = 64))
    val quant = pairs(Ann.cosineNearDupLshQuantized(emb, "vec_id", "embedding", 0.35, dim = 64))
    assert(exact.nonEmpty, "the synthetic embeddings should contain near-dup pairs")
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.98, s"quantized LSH recall $recall over ${exact.size} pairs")
    // scale cancellation keeps the scores themselves tight: every agreed
    // pair's quantized cosine is within int8 rounding of the float one
    val err = Ann.cosineNearDupLsh(emb, "vec_id", "embedding", 0.35, dim = 64)
      .withColumnRenamed("cosine", "c_f")
      .join(Ann.cosineNearDupLshQuantized(emb, "vec_id", "embedding", 0.35, dim = 64)
        .withColumnRenamed("cosine", "c_q"), Seq("id_1", "id_2"))
      .select(max(abs(col("c_f") - col("c_q")))).head().getDouble(0)
    assert(err <= 0.02, s"max cosine drift $err")

    // IVF: corpus side ships int8, queries stay float — rankings agree
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val (indexed, centers) = Ann.ivfIndex(emb, "vec_id", "embedding", k = 8)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = hits(Ann.knnIvf(indexed, centers, queries, "vec_id", "embedding", k = 5, nprobe = 2))
    val q = hits(Ann.knnIvfQuantized(indexed, centers, queries, "vec_id", "embedding", k = 5, nprobe = 2))
    val overlap = q.intersect(f).size.toDouble / f.size
    assert(overlap >= 0.98, s"quantized IVF top-k overlap $overlap over ${f.size}")
  }

  test("knnBrute matches a hand-computed top-k on a tiny corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Ann.knnBrute(corpus, corpus.filter(col("vec_id") === 1), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((2L, 1L), (3L, 2L)))
  }

  test("semanticDedup keeps one representative per planted paraphrase cluster") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    // 3 well-separated base directions, each with 4 near-identical
    // members (paraphrase clusters, cosine ~0.999) + 30 singletons
    val centers = Seq.fill(3)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val clustered = for {
      (c, g) <- centers.zipWithIndex
      m <- 0 until 4
    } yield (g * 10L + m) -> c.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val singles = (100L until 130L).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
    val corpus = (clustered ++ singles).toDF("vec_id", "embedding")
    val kept = Ann.semanticDedup(corpus, "vec_id", "embedding",
      kCells = 8, threshold = 0.99, dim = dim)
      .collect().map(_.getLong(0)).toSet
    // exactly the minimum id of each planted cluster survives; every
    // singleton survives (random gaussians at dim 16 don't reach 0.99)
    assert(kept == (Set(0L, 10L, 20L) ++ (100L until 130L)), kept)
    // schema passes through unchanged
    assert(Ann.semanticDedup(corpus, "vec_id", "embedding", 8, 0.99, dim)
      .schema.fieldNames.toSeq == Seq("vec_id", "embedding"))
  }

  test("semanticDedupPairs never crosses cells: the probe is bucketed, not filtered") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 16
    val a = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val b = Array.fill(dim)(rnd.nextGaussian().toFloat)
    // two true near-pairs (cosine ~0.999): one placed within a cell,
    // one ADVERSARIALLY split across cells by a caller-supplied
    // assignment — if the pair generator merely filtered cross-cell
    // candidates after an unkeyed join, both would surface; the
    // bucketed join must structurally never see the split pair
    val indexed = Seq(
      (1L, a, 0), (2L, a.map(x => x + 0.01f * rnd.nextGaussian().toFloat), 0),
      (3L, b, 0), (4L, b.map(x => x + 0.01f * rnd.nextGaussian().toFloat), 1))
      .toDF("vec_id", "embedding", "cluster")
    val pairs = Ann.semanticDedupPairs(indexed, "vec_id", "embedding",
      threshold = 0.99, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the within-cell pair, got $pairs")
    // the lean invariant rides along: checkpointed signature blocks
    // carry (id, cluster, band, sig) only — no vector payload
    val leaves = Ann.semanticDedupPairs(indexed, "vec_id", "embedding", 0.99, dim)
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.schema.fieldNames.toSeq
      }
    assert(leaves.nonEmpty && leaves.forall(_ == Seq("id", "cluster", "band", "sig")),
      s"signature checkpoint must be payload-lean, got schemas: $leaves")
  }

  test("compactNewWins: a read keeps each id's latest append only, batch column dropped") {
    import spark.implicits._
    // an append-only pile: id 1 appended in batches 0 and 2 (new wins),
    // id 2 only in batch 1, id 3 twice WITHIN its latest batch (both
    // rows are current — compaction is per-append, not per-row dedup)
    val store = Seq(
      (1L, 0, 10, 0L), (1L, 1, 11, 0L),
      (2L, 0, 20, 1L),
      (1L, 0, 90, 2L), (1L, 1, 91, 2L),
      (3L, 0, 30, 2L), (3L, 1, 31, 2L)
    ).toDF("id", "band", "sig", "batch_id")
    val got = Ann.compactNewWins(store, "id", "batch_id")
    assert(got.columns.toSeq == Seq("id", "band", "sig"))
    val rows = got.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((1L, 0, 90), (1L, 1, 91), (2L, 0, 20), (3L, 0, 30), (3L, 1, 31)),
      rows.toString)
  }

  test("native BandSigs kernel equals the column-algebra twin bit-for-bit (incl. degenerate vectors)") {
    import spark.implicits._
    // real embeddings + adversarial rows: null vector, short vector,
    // a null element inside the dim prefix, and int8 codes (the
    // quantized path feeds tinyint arrays through the same banding)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val extras = Seq(
      (9001L, null.asInstanceOf[Seq[Double]])
    ).toDF("id", "v")
    val withNullElem = Seq((9004L, Seq[java.lang.Double](1.0, null) ++
      Seq.fill(62)(java.lang.Double.valueOf(0.5)))).toDF("id", "v")
    val frame = emb.unionByName(extras).unionByName(withNullElem)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band", "sig").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val kernel = rows(Ann.bandSignatures(frame, "id", "v", bands = 4, bitsPerBand = 4, dim = 64))
    val hof = rows(Ann.bandSignaturesHof(frame, "id", "v", bands = 4, bitsPerBand = 4, dim = 64))
    assert(kernel == hof)
    // int8 codes ride the same kernel (the quantized path)
    val codes = emb.limit(50).select(col("id"),
      transform(col("v"), x => (x * lit(10)).cast("tinyint")).as("v"))
    val kernelQ = rows(Ann.bandSignatures(codes, "id", "v", bands = 4, bitsPerBand = 4, dim = 64))
    val hofQ = rows(Ann.bandSignaturesHof(codes, "id", "v", bands = 4, bitsPerBand = 4, dim = 64))
    assert(kernelQ == hofQ)
    // a vector shorter than dim is a caller bug and fails LOUD (the
    // HOF form threw on ANSI element_at past the end; the kernel keeps
    // that contract rather than silently bucketing malformed input)
    val short = Seq((9002L, Seq(1.0, -2.0))).toDF("id", "v")
    intercept[Exception] {
      Ann.bandSignatures(short, "id", "v", bands = 4, bitsPerBand = 4, dim = 64).collect()
    }
  }
}
