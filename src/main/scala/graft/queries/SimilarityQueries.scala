package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Ann

/** Similarity-search queries (q95) + DuckDB oracle. q96 (LSH ANN) is
  * recall-tested against the brute-force baseline in SimilaritySpec —
  * its hyperplane signatures are Spark-computed and not replayable in
  * SQL.
  *
  * The oracle recomputes cosine in double precision with sequential
  * sums (matching the fused single-pass loop in
  * graft.functions.CosineSimilarity) and ranks by the 4-decimal-rounded
  * score with neighbor id as tiebreak — the same reproducible ordering
  * the Spark side uses.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q95_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.knnBrute(emb, emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 5)
    }),

    // embedding-cosine near-dup pairs, exact semantics gate (threshold
    // chosen so the synthetic corpus yields a few hundred pairs); the
    // 100 TB path is cosineNearDupLsh — recall-tested in SimilaritySpec
    "q116_embed_neardup" -> ((s, d) =>
      Ann.cosineNearDupBrute(Tables.embeddings(s, d), "vec_id", "embedding", threshold = 0.35)),

    // the PRODUCTION ANN paths, benched per round as rows-only entries
    // (the q40a pattern): hyperplane signatures / k-means cells are
    // Spark-computed and not replayable in SQL, so correctness lives in
    // SimilaritySpec's recall gates vs q95's exact baseline — these
    // rows exist so the scale paths' plans and timings are ARTIFACT
    // facts every round, not just test-suite facts
    "q96_knn_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.knnLsh(emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, dim = 64)
    }),

    // the LSH near-dup production path and its int8-quantized twin
    // (corpus rides the banding shuffle as tinyint codes): rows-only,
    // recall-gated vs each other and the brute baseline in
    // SimilaritySpec
    "q116a_neardup_lsh" -> ((s, d) =>
      Ann.cosineNearDupLsh(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.35, dim = 64)),

    "q116b_neardup_lsh_quant" -> ((s, d) =>
      Ann.cosineNearDupLshQuantized(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.35, dim = 64)),

    "q96a_knn_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // index build (k-means fit) is part of the measured operator:
      // an IVF path that ignores build cost would bench as fiction
      val (indexed, centers) = Ann.ivfIndex(emb, "vec_id", "embedding", k = 16)
      Ann.knnIvf(indexed, centers, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4)
    }),

    // Incremental ANN probe (rows-only ⊘, the q146 daily-crawl contract
    // for the embedding family — r16 verdict #4): vectors with
    // vec_id % 10 != 0 are the signed history (present as their LSH
    // signature STORE + the persisted embedding table); the rest arrive
    // as today's batch, plus every 37th stored id re-crawls (new-wins
    // must shadow its store rows). The asymmetric band probe generates
    // batch×corpus candidates only — old×old pairs never exist — and
    // the exact verify re-attaches vectors by id. Correctness lives in
    // SimilaritySpec (batch-restricted equivalence with the full LSH
    // run, staleness pins, recall vs brute); this row keeps the
    // incremental plan and timing an artifact fact per round.
    "q197_ann_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val hist = emb.filter(col("vec_id") % 10 =!= 0)
      val store = Ann.signatureStore(hist, "vec_id", "embedding", dim = 64)
        .localCheckpoint(true) // the persisted store stand-in
      val batch = emb.filter(col("vec_id") % 10 === 0 || col("vec_id") % 37 === 1)
      Ann.incrementalCosineNearDups(batch, "vec_id", "embedding",
        store, hist, threshold = 0.35, dim = 64)
    }),

    // SemDeDup composition (rows-only ⊘): k-means cells + within-cell
    // LSH near-dup + one representative per duplicate cluster —
    // cell-boundary semantics and planted-cluster recovery are pinned
    // in SimilaritySpec; the row keeps the composed plan and its
    // timing (index build included) an artifact fact. Output is the
    // kept ids, narrow on purpose: the bench should time the dedup,
    // not a wide embedding write.
    "q136_semantic_dedup" -> ((s, d) =>
      Ann.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        kCells = 16, threshold = 0.35, dim = 64)
        .select(col("vec_id"))))

  val oracles: Map[String, String] = Map(
    "q95_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                    FROM embeddings WHERE vec_id % 100 = 0),
         pairs AS (
           SELECT query_id, e.vec_id AS neighbor_id,
             round(
               list_sum(list_transform(range(1, len(qe) + 1),
                 i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
                    i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
               4) AS cosine
           FROM embeddings e, q
           WHERE e.vec_id <> query_id)
         SELECT query_id, neighbor_id, cosine, rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
               FROM pairs)
         WHERE rank <= 5""",

    "q116_embed_neardup" ->
      """SELECT * FROM (
           SELECT a.vec_id AS id_1, b.vec_id AS id_2,
             round(
               list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                    i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
               4) AS cosine
           FROM embeddings a, embeddings b
           WHERE a.vec_id < b.vec_id)
         WHERE cosine >= 0.35""")
}
