package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extraction.Incremental
import graft.services.Curator

/** Incremental extraction, CDC, and split queries (q70, q71, q80).
  *
  * q71 builds a deterministic CDC scenario from `events`: the target is
  * 80% of rows (event_id % 10 < 8), the change feed is the top half
  * (% 10 >= 5) with shifted values, deletes where event_id % 7 == 0 —
  * so the feed exercises all of upsert-existing / insert-new /
  * delete-existing / delete-nonexistent.
  */
object ExtractionQueries {

  type Q = (SparkSession, String) => DataFrame

  private val watermark = "2024-01-20 00:00:00"

  val queries: Map[String, Q] = Map(
    "q70_incremental" -> ((s, d) =>
      Incremental.readNewSince(
        Tables.events(s, d), "ts", Some(lit(watermark).cast("timestamp")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), round(col("value"), 2).as("value"))),

    "q71_cdc_apply" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val target = ev.filter(col("event_id") % 10 < 8)
      val changes = ev.filter(col("event_id") % 10 >= 5)
        .withColumn("value", col("value") + 1000)
        .withColumn("_change_type",
          when(col("event_id") % 7 === 0, "DELETE").otherwise("UPSERT"))
      Incremental.applyChanges(target, changes, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), round(col("value"), 2).as("value"))
    }),

    "q80_split" -> ((s, d) =>
      Curator.assignSplits(
        Tables.documents(s, d), col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1),
        seed = 42L, portable = true)
        .select(col("doc_id"), col("split"))),

    // Mixture rebalance: orders by o_orderstatus to equal thirds. The
    // synthetic status mix is mildly uneven, so the feasible scale
    // pins to the scarcest stratum (kept whole) and the others
    // downsample to match — the exact mechanics of a per-language
    // pretraining rebalance (where the skew is brutal instead of
    // mild). The oracle replays the identical Knuth-hash membership
    // and the identically-ordered K·t/n threshold arithmetic.
    "q120_rebalance" -> ((s, d) =>
      Curator.rebalance(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
        col("o_orderkey"), "o_orderstatus",
        Map("F" -> 1.0, "O" -> 1.0, "P" -> 1.0),
        seed = 42L, portable = true)),

    // RAG/long-context chunking: 32-token windows with 8-token overlap
    // (stride 24) over the ~54-token documents — most docs yield 2–3
    // chunks, short docs exactly one, so every branch of the chunk
    // -count arithmetic is exercised and hash-gated.
    "q127_chunk" -> ((s, d) =>
      Curator.chunkDocs(Tables.documents(s, d), "doc_id", "text",
        maxTokens = 32, overlap = 8)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk_text"), col("n_chunk_tokens"))),

    // Deterministic training-order sharding: 8 shards over documents
    // via the portable md5 key; the oracle replays the identical key,
    // shard arithmetic, and (key, doc_id)-ordered per-shard rank.
    "q137_shard_corpus" -> ((s, d) =>
      Curator.shardCorpus(Tables.documents(s, d), "doc_id", nShards = 8,
        seed = 42L, portable = true)
        .select(col("doc_id"), col("shard"), col("shard_pos"))),

    // Exact-count stratified sampling: 30/10/5 docs of src0/src1/src2
    // chosen by the portable hash order. At sf0.001 src0 carries only
    // 25 docs so its cap does NOT bind (the min(k, n) branch); src1/
    // src2's caps bind at every sf. The oracle replays the identical
    // rank; the literal max-k conjunct keeps the WindowGroupLimit
    // pushdown in the plan (plan-asserted).
    "q143_sample_exact" -> ((s, d) =>
      Curator.sampleExact(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        col("doc_id"), "source",
        Map("src0" -> 30L, "src1" -> 10L, "src2" -> 5L),
        seed = 42L, portable = true)),

    // Deterministic weighted sampling without replacement (A-Res,
    // Efraimidis & Spirakis 2006): 50 documents, inclusion chance ∝
    // n_chars, drawn by the seeded md5 avalanche hash on the
    // micro-nat log grid — the same sample in any engine or retry.
    // The oracle replays draw, quantized ln, key division and the
    // (key, id) top-k ordering.
    "q167_weighted_sample" -> ((s, d) =>
      Curator.weightedSample(Tables.documents(s, d), "doc_id", "n_chars",
        k = 50, seed = 42L)),

    // Scale-safe global ranking (curriculum ordering): rank every
    // document by (n_chars desc, doc_id) WITHOUT the single-partition
    // Window.orderBy anti-pattern — range partition + per-range
    // row_number + bounded offset prefix-sum. Ranks are independent
    // of where range boundaries fall (the order is strict), so the
    // oracle is plain row_number over the total order.
    "q155_global_rank" -> ((s, d) =>
      Curator.globalRank(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", Seq(col("n_chars").desc), numRanges = 32)),

    // Multi-epoch oversampling: sources src0/src1/src2 at 60/30/10
    // weights against a fixed 60k-token budget. At sf0.01 this
    // exercises every branch — src0 hits the 16-epoch cap (part = 0),
    // src1 takes ~13 full epochs + a partial, src2 ~4 + a partial.
    // The oracle replays the token sums, the documented double
    // arithmetic order, and the Knuth partial-epoch membership.
    "q142_epoch_mix" -> ((s, d) => {
      val withTok = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Curator.epochMix(withTok, col("doc_id"), "source", "n_tokens",
        Map("src0" -> 0.6, "src1" -> 0.3, "src2" -> 0.1),
        tokenBudget = 60000L, maxEpochs = 16.0, seed = 42L, portable = true)
        .select(col("doc_id"), col("source"), col("epoch").cast("long").as("epoch"))
    }))

  val oracles: Map[String, String] = Map(
    "q70_incremental" ->
      s"""SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
          FROM events WHERE ts > TIMESTAMP '$watermark'""",

    "q71_cdc_apply" ->
      """WITH target AS (SELECT * FROM events WHERE event_id % 10 < 8),
         changes AS (
           SELECT event_id, ts, user_id, event_type, value + 1000 AS value,
                  CASE WHEN event_id % 7 = 0 THEN 'DELETE' ELSE 'UPSERT' END AS ct
           FROM events WHERE event_id % 10 >= 5)
         SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
         FROM target WHERE event_id NOT IN (SELECT event_id FROM changes)
         UNION ALL
         SELECT event_id, user_id, event_type, ts, round(value, 2)
         FROM changes WHERE ct = 'UPSERT'""",

    "q80_split" ->
      """SELECT doc_id,
                CASE WHEN frac < 0.8 THEN 'train'
                     WHEN frac < 0.9 THEN 'test'
                     ELSE 'val' END AS split
         FROM (SELECT doc_id,
                      ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0 AS frac
               FROM documents)""",

    // identical Knuth-hash membership; threshold arithmetic ordered
    // exactly as Curator.rebalance computes it (K·t, then /n) so the
    // doubles are bit-identical
    "q120_rebalance" ->
      """WITH n AS (SELECT o_orderstatus AS s, count(*) AS cnt FROM orders GROUP BY 1),
            k AS (SELECT min(cnt / (1.0/3)) AS kk FROM n),
            keep AS (SELECT s, least(1.0, (SELECT kk FROM k) * (1.0/3) / cnt) AS f FROM n)
         SELECT o_orderkey, o_orderstatus
         FROM orders JOIN keep ON o_orderstatus = keep.s
         WHERE ((o_orderkey + 42) * 2654435761 % 4294967296) / 4294967296.0 < f""",

    // identical tokenization; chunk count replayed with exact integer
    // arithmetic ((n-32+23) // 24 + 1), chunk text via DuckDB's
    // 1-based end-inclusive list slice
    "q127_chunk" ->
      """WITH w AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
            FROM documents),
         d AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
         c AS (SELECT doc_id, i AS chunk_idx,
                 array_to_string(ws[i * 24 + 1 : least(i * 24 + 32, n)], ' ') AS chunk_text,
                 least(32, n - i * 24) AS n_chunk_tokens
               FROM d, unnest(range(0,
                 CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END)) AS t(i))
         SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens FROM c""",

    // identical md5-derived 60-bit key (the q93 fingerprint scheme),
    // identical shard = key % 8, identical (key, doc_id) rank order
    "q137_shard_corpus" ->
      """WITH h AS (SELECT doc_id,
              CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':', '42')), 1, 15)) AS BIGINT) AS hk
            FROM documents)
         SELECT doc_id, hk % 8 AS shard,
                row_number() OVER (PARTITION BY hk % 8 ORDER BY hk, doc_id) AS shard_pos
         FROM h""",

    // identical Knuth-hash order (key tiebreak) and per-stratum rank;
    // the per-stratum cap is the same CASE arithmetic
    "q143_sample_exact" ->
      """WITH r AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source
                ORDER BY ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0, doc_id) AS rk
            FROM documents WHERE source IN ('src0', 'src1', 'src2'))
         SELECT doc_id, source FROM r
         WHERE rk <= 30 AND rk <= CASE source WHEN 'src0' THEN 30 WHEN 'src1' THEN 10 ELSE 5 END""",

    // identical md5 draw (60-bit slice, the +1 keeps u in (0,1]),
    // identical quantized ln and key arithmetic, identical top-k order
    "q167_weighted_sample" ->
      """WITH w AS (
           SELECT *,
             CAST(floor(ln((CAST(concat('0x',
                 substr(md5(doc_id || ':42'), 1, 15)) AS BIGINT) + 1)
               / 1152921504606846976.0) * 1000000 + 0.5) AS BIGINT) AS lnu
           FROM documents WHERE n_chars > 0)
         SELECT doc_id, text, lang, source, n_chars,
           CAST(lnu AS DOUBLE) / n_chars AS sample_key
         FROM w ORDER BY sample_key DESC, doc_id LIMIT 50""",

    // the two-pass range scheme yields exactly the total-order
    // row_number (strict order ⇒ boundary-independent ranks)
    "q155_global_rank" ->
      """SELECT doc_id,
           row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
         FROM documents""",

    // identical tokenize + per-source token sums; epochs computed with
    // the double arithmetic in epochMix's documented order
    // (budget·(w/Σw))/tok, capped by least, floored to full copies;
    // the partial epoch keeps the identical Knuth-hash slice; the
    // epoch sequence is the q127-style lateral unnest(range)
    "q142_epoch_mix" ->
      """WITH d AS (SELECT doc_id, source,
              CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS BIGINT) AS ntok
            FROM documents WHERE source IN ('src0', 'src1', 'src2')),
         tot AS (SELECT source AS s, CAST(sum(ntok) AS BIGINT) AS tok FROM d GROUP BY source),
         w(s2, wt) AS (VALUES ('src0', 0.6), ('src1', 0.3), ('src2', 0.1)),
         p AS (SELECT s, CAST(floor(e) AS INT) AS nfull, e - floor(e) AS part
               FROM (SELECT s, least(16.0, (60000 * (wt / (0.6 + 0.3 + 0.1))) / tok) AS e
                     FROM tot JOIN w ON s = s2)),
         j AS (SELECT doc_id, source, nfull, part FROM d JOIN p ON d.source = p.s)
         SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
         FROM j, unnest(range(0, nfull + 1)) AS t(i)
         WHERE i < nfull OR ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0 < part""")
}
