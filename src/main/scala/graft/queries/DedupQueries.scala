package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{BloomStore, TextDedup}

/** Dedup-family queries (q90–q94, q114) + DuckDB oracles.
  *
  * The synthetic `documents` table plants ~25 true near-dup pairs
  * (3-gram-shingle Jaccard ≥ 0.8); q92's MinHash+LSH pipeline and
  * q94's exact-shingle baseline both recover them, and the DuckDB
  * oracles replay the identical integer-hash arithmetic end-to-end.
  * q93 (SimHash) is oracle-gated too since the fingerprint hash is
  * md5-derived (portable): the oracle rebuilds all 64 sign-sums and
  * verifies the banded near-pair search against all-pairs Hamming
  * distance — exact for maxDist ≤ 3 by the pigeonhole argument.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 16; private val Bands = 8; private val N = 3
  private val P = TextDedup.MinhashPrime

  val queries: Map[String, Q] = Map(
    "q90_dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val withDups = docs.unionByName(
        docs.filter(col("doc_id") % 10 < 2)
          .select((col("doc_id") + 10000000).as("doc_id"), col("text")))
      TextDedup.exactDedup(withDups, "doc_id", "text")
    }),

    "q91_dedup_jaccard" -> ((s, d) =>
      TextDedup.jaccardPairs(
        TextDedup.tokenSets(Tables.documents(s, d), "doc_id", "text"), 0.95)),

    // Paragraph-level exact dedup (C4's duplicate-span rule at Dolma's
    // paragraph granularity): the corpus text becomes 8-word
    // paragraphs (the q118 sentence-break trick), then every doc gets
    // the SAME two footer paragraphs plus a per-source promo line —
    // shared spans whole-document hashing (q90) cannot see. Expected:
    // each doc keeps its unique prose; the footers survive only in
    // doc 0 and the promo lines once per source.
    "q149_paragraph_dedup" -> ((s, d) => {
      val sent = regexp_replace(col("text"), "((\\S+\\s+){7}\\S+)\\s+", "$1\n")
      val mt = concat(sent,
        lit("\nfollow us on social media for more updates"),
        lit("\ncopyright example corp all rights reserved"),
        lit("\nmore stories from source "), col("source"))
      TextDedup.dedupParagraphs(
        Tables.documents(s, d).select(col("doc_id"), mt.as("text")),
        "doc_id", "text")
    }),

    // q149 under the daily-crawl contract: history (doc_id % 10 != 0)
    // is only present as its paragraph-hash store; the batch (every
    // 10th doc) drops the universal footers and per-source promo lines
    // (all claimed by history) plus anything claimed within the batch,
    // keeps its unique prose. Work ∝ batch — history text never read.
    "q150_incremental_paragraphs" -> ((s, d) => {
      val sent = regexp_replace(col("text"), "((\\S+\\s+){7}\\S+)\\s+", "$1\n")
      val mt = concat(sent,
        lit("\nfollow us on social media for more updates"),
        lit("\ncopyright example corp all rights reserved"),
        lit("\nmore stories from source "), col("source"))
      val docs = Tables.documents(s, d).select(col("doc_id"), mt.as("text"))
      val store = TextDedup.paragraphStore(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .localCheckpoint(true)
      TextDedup.dedupParagraphsIncremental(
        docs.filter(col("doc_id") % 10 === 0), store, "doc_id", "text")
    }),

    "q92_dedup_minhash" -> ((s, d) =>
      TextDedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        n = N, k = K, bands = Bands, threshold = 0.5)),

    // Split-leakage audit: the q92 near-dup pairs against the q80
    // portable split — every near-dup pair a naive random split put on
    // opposite sides of a train/eval boundary.
    "q138_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val splits = graft.services.Curator.assignSplits(
        docs.select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1),
        seed = 42L, portable = true)
      TextDedup.splitLeakage(docs, "doc_id", "text", splits, "doc_id", "split",
        n = N, k = K, bands = Bands, threshold = 0.5)
    }),

    // Leakage-safe splitting: the q114 clusters as assignment unit
    // under the q80 portable split arithmetic — zero cross-split
    // near-dup pairs by construction.
    "q139_cluster_split" -> ((s, d) =>
      TextDedup.leakageSafeSplits(Tables.documents(s, d), "doc_id", "text",
        Seq("train" -> 0.8, "test" -> 0.1, "val" -> 0.1),
        seed = 42L, portable = true, n = N, k = K, bands = Bands, threshold = 0.5)
        .select(col("id").as("doc_id"), col("cluster_id"), col("split"))),

    "q93_dedup_simhash" -> ((s, d) => {
      val sigs = TextDedup.simhash64(
        TextDedup.tokenSets(Tables.documents(s, d), "doc_id", "text"))
      TextDedup.simhashNearPairs(sigs, maxDist = 3)
        .select(col("id_1"), col("id_2"), col("distance").cast("long").as("distance"))
    }),

    "q94_dedup_ngram" -> ((s, d) =>
      TextDedup.jaccardPairs(
        TextDedup.shingleSets(Tables.documents(s, d), "doc_id", "text", N), 0.5)),

    // Asymmetric containment (full DuckDB oracle): excerpt/quote
    // detection — snippet docs (first 30 words of every 11th document,
    // id + 10000000) have their 3-gram shingles fully contained in the
    // base doc even though symmetric Jaccard is far below any useful
    // threshold. The prefix×index candidate join replays exactly under
    // the brute-force oracle because the filter chain is EXACT.
    "q163_containment" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val snip = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
      TextDedup.containmentPairs(
        TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N), 0.9)
    }),

    // Banded containment PRODUCTION path under the FULL hash gate
    // (r16, the r15 verdict's #3): every stage is deterministic —
    // the df ≤ 1000 universe cut, the rarest-32 probe ordered by
    // (df, md5-derived item id, item), the k ≥ (t−slack)·m count
    // filter in double arithmetic, exact verify over the full sets —
    // so the oracle replays cut + probe + verify stage-for-stage in
    // DuckDB (the q93/q123 discipline).
    // Snippets carry ≤ 28 shingles ≤ the 32-item sketch, so candidate
    // generation is exact for them; recall for larger probe sets is
    // the gated estimate trade (DedupSpec).
    "q185_containment_banded" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val snip = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
      TextDedup.containmentPairsBanded(
        TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N), 0.9)
    }),

    // The banded APPLY path as a per-round bench artifact (rows-only ⊘
    // by the r15 verdict's ask: q191 hashes the keeper RULE on the
    // exact pairs; this row RUNS removeContained(banded = true) — the
    // production composition — every round. DedupSpec pins banded ==
    // exact on this very fixture, so the two rows must agree).
    "q191a_containment_dedup_banded" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val snip = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
      TextDedup.removeContained(
        TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N), 0.9,
        banded = true)
        .withColumnRenamed("id", "doc_id")
    }),

    // The APPLY half of the containment family under the FULL hash
    // gate: q163's corpus with every t-contained doc dropped in favor
    // of its container (size desc, id asc keeper order) — snippets
    // vanish, their source docs and all unrelated docs survive. The
    // oracle replays the brute-force pairs + sizes + the keeper rule.
    "q191_containment_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val snip = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
      TextDedup.removeContained(
        TextDedup.shingleSets(base.unionByName(snip), "doc_id", "text", N), 0.9)
        .withColumnRenamed("id", "doc_id")
    }),

    // the PPJoin prefix path under the full hash gate: shingle vocab
    // is >64 and t = 0.8 ≥ the measured 0.7 crossover, so the adaptive
    // chooser routes HERE through jaccardPairsPrefix — the oracle is
    // the same exact-Jaccard replay as q94 at the higher threshold
    "q125_dedup_prefix" -> ((s, d) =>
      TextDedup.jaccardPairs(
        TextDedup.shingleSets(Tables.documents(s, d), "doc_id", "text", N), 0.8)),

    // Corpus-level line-dedup (RefinedWeb/CCNet boilerplate family):
    // the word-soup corpus gets deterministic line structure (8-word
    // sentences, the q118 construction) plus a universal footer line —
    // real boilerplate present in every document — and the 25 planted
    // near-dup pairs share their content lines naturally.
    "q119_line_boilerplate" -> ((s, d) => {
      val sent = regexp_replace(col("text"), "((\\S+\\s+){7}\\S+)\\s+", "$1.\n")
      val mt = concat(sent, lit("\nall rights reserved contact us at example dot com."))
      val docs = Tables.documents(s, d).select(col("doc_id"), mt.as("mtext"))
      // hotLineMinDocs = 400: the universal footer (one line per doc,
      // 500 docs at sf0.01 / 5000 at sf0.1) exercises the hot-broadcast
      // path in the gated query, so the production plan shape is what
      // the oracle and the bench both see
      TextDedup.boilerplateLines(docs, "doc_id", "mtext", minDocs = 2, hotLineMinDocs = 400)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_boilerplate_lines"),
          col("boilerplate_frac"), col("passes"))
    }),

    // Benchmark decontamination: every 50th document plays the eval
    // benchmark; the rest is the training corpus. 13-gram collision
    // (the GPT-3/PaLM standard) — the planted near-dup pairs that
    // straddle the eval/train boundary surface as contaminated.
    "q121_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextDedup.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 13)
        .select(col("id").as("doc_id"), col("n_shared_ngrams"), col("contaminated"))
    }),

    // the daily-crawl shape under the full hash gate: every 10th doc
    // plays the incoming batch, the rest the signed corpus (only its
    // SIGNATURES exist — the incremental trade); pairs are signature
    // ESTIMATES, every one involving >= 1 new doc, old x old never
    // generated
    "q123_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // the contract says oldSigs IS a persisted store (VersionedTable
      // append per batch); the fixture mirrors that by materializing
      // its in-query stand-in once, as DedupSpec's fixture does
      val oldSigs = TextDedup.minhashSignatures(
        TextDedup.shingleSets(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", N), K)
        .localCheckpoint(true)
      TextDedup.incrementalNearDups(docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        oldSigs, n = N, k = K, bands = Bands, threshold = 0.5)
    }),

    // the daily-crawl shape for the FINGERPRINT family (q93/q134/
    // q144/q145 all emit (id, simhash) rows): every 10th doc plays
    // the incoming batch, the rest the signed corpus — only its
    // 16-byte/row fingerprint store exists, the incremental trade;
    // the asymmetric band probe never generates old×old pairs, and
    // every output pair involves ≥ 1 batch doc. Full hash gate: the
    // simhash is the portable md5 bit replay, so DuckDB rebuilds the
    // fingerprints and replays the probe condition exactly.
    "q146_incremental_fingerprint" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def sigs(part: DataFrame) =
        TextDedup.simhash64(TextDedup.tokenSets(part, "doc_id", "text"))
      // the persisted-store stand-in, materialized once (the q123
      // fixture discipline)
      val oldSigs = sigs(docs.filter(col("doc_id") % 10 =!= 0)).localCheckpoint(true)
      TextDedup.simhashNearPairsIncremental(
        sigs(docs.filter(col("doc_id") % 10 === 0)), oldSigs, maxDist = 3)
        .select(col("id_1"), col("id_2"), col("distance").cast("long").as("distance"))
    }),

    // URL-level dedup (RefinedWeb/CCNet keep-one-per-canonical-URL):
    // five crawl spellings of the same page — case-varied host, www,
    // default port, tracking params, reordered query, fragment,
    // trailing slash — collapse to one canonical URL per (site, item)
    "q124_url_dedup" -> ((s, d) => {
      val k = col("c_custkey")
      val site = (k % 500).cast("string"); val item = (k % 100).cast("string")
      val raw = when(k % 5 === 0,
          concat(lit("https://www.EXAMPLE"), site, lit(".com/item/"), item, lit("?b=2&a=1#frag")))
        .when(k % 5 === 1,
          concat(lit("https://example"), site, lit(".com/item/"), item, lit("?a=1&b=2")))
        .when(k % 5 === 2,
          concat(lit("https://Example"), site, lit(".COM/item/"), item, lit("/?utm_source=x&a=1&b=2")))
        .when(k % 5 === 3,
          concat(lit("https://example"), site, lit(".com:443/item/"), item, lit("?a=1&b=2&gclid=zz")))
        .otherwise(
          concat(lit("https://example"), site, lit(".com/item/"), item, lit("?b=2&utm_medium=m&a=1")))
      val urls = Tables.customer(s, d).select(k.as("doc_id"), raw.as("url"))
      urls.groupBy(graft.text.TextAnalysis.normalizeUrl(col("url")).as("url"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
    }),

    // Bloom-filter seen-URL store (the Mercator/Dolma crawler
    // membership test): build the bit store from the "already crawled"
    // URLs (custkey % 3 != 0), probe the next batch (% 2 == 0) —
    // possibly_seen=false is definitive, true is probabilistic. The
    // filter is sized DOWN (16 buckets × 4 words × 62 bits, ~42% load)
    // so the fixture exercises real false positives; the DuckDB oracle
    // replays the identical md5 double-hash bit arithmetic, so the
    // probabilistic answer is still hash-exact.
    "q153_bloom_url_seen" -> ((s, d) => {
      val k = col("c_custkey")
      val url = concat(lit("https://example"), (k % 500).cast("string"),
        lit(".com/item/"), (k % 100).cast("string"))
      val cust = Tables.customer(s, d).select(k.as("ck"), url.as("url"))
      val store = BloomStore.build(cust.filter(col("ck") % 3 =!= 0), "url",
        nBuckets = 16, wordsPerBucket = 4, numHashes = 5)
      BloomStore.probe(store, cust.filter(col("ck") % 2 === 0), "url",
        nBuckets = 16, wordsPerBucket = 4, numHashes = 5)
        .select(col("url"), col("bucket").cast("long").as("bucket"),
          col("possibly_seen"))
    }),

    // Substring-level dedup (the suffix-array family, q126): duplicated
    // 8-gram span coverage per document. A 10-token universal footer is
    // planted on every doc — its 3 fully-interior grams occur in all
    // 500 docs, exercising the hot-broadcast route of the count rejoin
    // (hotGramMinDocs = 400) in the gated plan, exactly like q119's
    // footer does for lines; the 25 planted near-dup pairs supply the
    // long organic spans.
    "q126_repeated_spans" -> ((s, d) => {
      val mt = concat(col("text"),
        lit(" all rights reserved contact the site operator for permission details"))
      val docs = Tables.documents(s, d).select(col("doc_id"), mt.as("mtext"))
      TextDedup.repeatedSpans(docs, "doc_id", "mtext",
        k = 8, minCount = 2, maxDupFrac = 0.5, hotGramMinCount = 400,
        portable = true)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_tokens"),
          col("n_spans"), col("dup_frac"), col("passes"))
    }),

    // the production fast path (codegen'd xxhash64 gram ids, no gram
    // string built): benched rows-only per round, the q40a pattern —
    // row-identity vs the portable path is asserted in DedupSpec
    "q126a_repeated_spans_fast" -> ((s, d) => {
      val mt = concat(col("text"),
        lit(" all rights reserved contact the site operator for permission details"))
      val docs = Tables.documents(s, d).select(col("doc_id"), mt.as("mtext"))
      TextDedup.repeatedSpans(docs, "doc_id", "mtext",
        k = 8, minCount = 2, maxDupFrac = 0.5, hotGramMinCount = 400)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_tokens"),
          col("n_spans"), col("dup_frac"), col("passes"))
    }),

    // Surgical decontamination (q121's remediation twin): same
    // eval/train partition and 13-gram construction as q121, but the
    // colliding spans are CUT and the document kept — the planted
    // near-dup pairs straddling the %50 boundary lose their leaked
    // runs, clean docs pass through token-identical (text is rebuilt
    // as the normalized lowercase token join)
    "q128_trim_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextDedup.trimContaminatedSpans(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 13, portable = true)
        .select(col("id").as("doc_id"), col("text"),
          col("n_tokens"), col("n_kept_tokens"))
    }),

    "q114_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text",
        n = N, k = K, bands = Bands, threshold = 0.5)
      TextDedup.dedupClusters(pairs, docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("cluster_id"))
    }))

  private val tokSql =
    """tok AS (
         SELECT DISTINCT doc_id AS id, tok AS item FROM (
           SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
           FROM documents)
         WHERE tok <> '')"""

  private val shSql =
    s"""w AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
            FROM documents),
        sh AS (SELECT DISTINCT doc_id AS id,
                      ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS item
               FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
               WHERE len(ws) >= $N)"""

  private def jaccardSql(setsCte: String, setsName: String, threshold: Double): String =
    s"""WITH $setsCte,
        sizes AS (SELECT id, count(*) AS sz FROM $setsName GROUP BY id),
        inter AS (SELECT a.id AS id_1, b.id AS id_2, count(*) AS i
                  FROM $setsName a JOIN $setsName b ON a.item = b.item AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_1, id_2, i / (s1.sz + s2.sz - i) AS jaccard
        FROM inter
        JOIN sizes s1 ON id_1 = s1.id
        JOIN sizes s2 ON id_2 = s2.id
        WHERE i / (s1.sz + s2.sz - i) >= $threshold"""

  private val q92Ctes = {
    val mhCols = (0 until K).map(i =>
      s"min((sid * ${1 + 4 * i} + ${7 + 11 * i}) % $P) AS mh_$i").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      s"""SELECT id, $b AS band,
          CAST(mh_${2 * b} AS VARCHAR) || '_' || CAST(mh_${2 * b + 1} AS VARCHAR) AS sig
          FROM mh"""
    }.mkString("\nUNION ALL\n")
    s"""$shSql,
        freq92 AS (SELECT item, count(*) AS df FROM sh GROUP BY item),
        sids AS (SELECT s.id, CAST(concat('0x', substr(md5(s.item), 1, 8)) AS BIGINT) AS sid
                 FROM sh s JOIN freq92 f ON f.item = s.item
                 WHERE f.df <= ${TextDedup.DefaultMaxItemDf}),
        mh AS (SELECT id, $mhCols FROM sids GROUP BY id),
        bands AS ($bandSelects),
        cand AS (SELECT DISTINCT b1.id AS id_1, b2.id AS id_2
                 FROM bands b1 JOIN bands b2
                   ON b1.band = b2.band AND b1.sig = b2.sig AND b1.id < b2.id),
        sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        uni AS (SELECT id_1, id_2, count(*) AS u FROM (
                  SELECT DISTINCT id_1, id_2, item FROM (
                    SELECT id_1, id_2, sh.item FROM cand JOIN sh ON sh.id = cand.id_1
                    UNION ALL
                    SELECT id_1, id_2, sh.item FROM cand JOIN sh ON sh.id = cand.id_2))
                GROUP BY 1, 2)"""
  }

  /** q124 oracle: the URL fixture and the whole canonicalization chain
    * — fragment, scheme://host lowercasing, port/www strip, trailing
    * slash, tracking-param filter, parameter sort — replayed step for
    * step in DuckDB (split_part/substr stand in for substring_index;
    * array_to_string on an empty list is NULL → coalesce). */
  private val q124Sql =
    """WITH urls AS (
         SELECT c_custkey AS doc_id,
           CASE
             WHEN c_custkey % 5 = 0 THEN 'https://www.EXAMPLE' || CAST(c_custkey % 500 AS VARCHAR) || '.com/item/' || CAST(c_custkey % 100 AS VARCHAR) || '?b=2&a=1#frag'
             WHEN c_custkey % 5 = 1 THEN 'https://example' || CAST(c_custkey % 500 AS VARCHAR) || '.com/item/' || CAST(c_custkey % 100 AS VARCHAR) || '?a=1&b=2'
             WHEN c_custkey % 5 = 2 THEN 'https://Example' || CAST(c_custkey % 500 AS VARCHAR) || '.COM/item/' || CAST(c_custkey % 100 AS VARCHAR) || '/?utm_source=x&a=1&b=2'
             WHEN c_custkey % 5 = 3 THEN 'https://example' || CAST(c_custkey % 500 AS VARCHAR) || '.com:443/item/' || CAST(c_custkey % 100 AS VARCHAR) || '?a=1&b=2&gclid=zz'
             ELSE 'https://example' || CAST(c_custkey % 500 AS VARCHAR) || '.com/item/' || CAST(c_custkey % 100 AS VARCHAR) || '?b=2&utm_medium=m&a=1'
           END AS url
         FROM customer),
       parts AS (
         SELECT doc_id,
           regexp_replace(url, '#.*$', '') AS nofrag
         FROM urls),
       pieces AS (
         SELECT doc_id, nofrag,
           regexp_extract(nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*') AS sh,
           regexp_extract(nofrag, '\?([^#]*)$', 1) AS query
         FROM parts),
       norm AS (
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(lower(sh),
                            '^(http://.*):80$', '\1'),
                            '^(https://.*):443$', '\1'),
                          '^(https?://)www\.', '\1')
           || regexp_replace(substr(split_part(nofrag, '?', 1), length(sh) + 1), '/+$', '')
           || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS url
         FROM (
           SELECT doc_id, nofrag, sh,
             coalesce(array_to_string(list_sort(
               list_filter(string_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)='))),
               '&'), '') AS q
           FROM pieces))
       SELECT url, min(doc_id) AS doc_id, count(*) AS n_variants
       FROM norm GROUP BY url"""

  /** q153 oracle: the Bloom store replayed bit-for-bit — the same
    * md5 double-hash (Kirsch-Mitzenmacher) positions, the same 62-bit
    * words (DuckDB `<<` overflows at 63), the same bit_or fold and
    * mask compare. A false positive is a property of the bit
    * arithmetic, not of the engine, so even the probabilistic rows
    * hash-match. */
  private val q153Sql =
    """WITH cust AS (
         SELECT c_custkey AS ck,
           'https://example' || CAST(c_custkey % 500 AS VARCHAR) ||
             '.com/item/' || CAST(c_custkey % 100 AS VARCHAR) AS url
         FROM customer),
       sh AS (
         SELECT url,
           CAST(concat('0x', substr(md5('bloomA' || url), 1, 15)) AS BIGINT) AS h1,
           CAST(concat('0x', substr(md5('bloomB' || url), 1, 15)) AS BIGINT) AS h2
         FROM cust WHERE ck % 3 <> 0),
       spos AS (
         SELECT h1 % 16 AS bucket, (h1 + i * h2) % 248 AS p
         FROM sh, unnest(range(0, 5)) AS t(i)),
       store AS (
         SELECT bucket, p // 62 AS word,
           bit_or(1::BIGINT << CAST(p % 62 AS INT)) AS mask
         FROM spos GROUP BY bucket, p // 62),
       bh AS (
         SELECT DISTINCT url,
           CAST(concat('0x', substr(md5('bloomA' || url), 1, 15)) AS BIGINT) AS h1,
           CAST(concat('0x', substr(md5('bloomB' || url), 1, 15)) AS BIGINT) AS h2
         FROM cust WHERE ck % 2 = 0),
       probes AS (
         SELECT url, h1 % 16 AS bucket,
           ((h1 + i * h2) % 248) // 62 AS word,
           1::BIGINT << CAST(((h1 + i * h2) % 248) % 62 AS INT) AS m
         FROM bh, unnest(range(0, 5)) AS t(i))
       SELECT p.url, CAST(p.bucket AS BIGINT) AS bucket,
         bool_and(s.mask IS NOT NULL AND (s.mask & p.m) = p.m) AS possibly_seen
       FROM probes p LEFT JOIN store s ON s.bucket = p.bucket AND s.word = p.word
       GROUP BY p.url, p.bucket"""

  /** q123 oracle: same signature replay as q92, then the ASYMMETRIC
    * band probe (new batch's bands against the full corpus's) and the
    * matching-component estimate — no shingle re-read for old docs,
    * mirroring the incremental contract. */
  private val q123Sql = {
    val mhCols = (0 until K).map(i =>
      s"min((sid * ${1 + 4 * i} + ${7 + 11 * i}) % $P) AS mh_$i").mkString(", ")
    def bandSelects(src: String) = (0 until Bands).map { b =>
      s"""SELECT id, $b AS band,
          CAST(mh_${2 * b} AS VARCHAR) || '_' || CAST(mh_${2 * b + 1} AS VARCHAR) AS sig
          FROM $src"""
    }.mkString("\nUNION ALL\n")
    val matching = (0 until K)
      .map(i => s"CASE WHEN l.mh_$i = r.mh_$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $shSql,
        sids AS (SELECT id, CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS sid FROM sh),
        mh AS (SELECT id, $mhCols FROM sids GROUP BY id),
        new_mh AS (SELECT * FROM mh WHERE id % 10 = 0),
        all_mh AS (SELECT * FROM mh WHERE id % 10 <> 0 AND id NOT IN (SELECT id FROM new_mh)
                   UNION ALL SELECT * FROM new_mh),
        nb AS (${bandSelects("new_mh")}),
        ab AS (${bandSelects("all_mh")}),
        cand AS (SELECT DISTINCT least(nb.id, ab.id) AS id_1, greatest(nb.id, ab.id) AS id_2
                 FROM nb JOIN ab ON nb.band = ab.band AND nb.sig = ab.sig AND nb.id <> ab.id)
        SELECT id_1, id_2, ($matching) / ${K}.0 AS est_jaccard
        FROM cand JOIN all_mh l ON l.id = id_1 JOIN all_mh r ON r.id = id_2
        WHERE ($matching) / ${K}.0 >= 0.5"""
  }

  private val q92Select =
    """SELECT id_1, id_2, (s1.sz + s2.sz - u) / u AS jaccard
       FROM uni JOIN sizes s1 ON id_1 = s1.id JOIN sizes s2 ON id_2 = s2.id
       WHERE (s1.sz + s2.sz - u) / u >= 0.5"""

  /** q139 oracle: the q114 cluster replay (recursive CTE) with the q80
    * portable Knuth-hash split arithmetic applied to CLUSTER ids. */
  private val q139Sql =
    s"""WITH RECURSIVE $q92Ctes,
        verified AS ($q92Select),
        edges AS (SELECT id_1 AS a, id_2 AS b FROM verified
                  UNION ALL SELECT id_2, id_1 FROM verified),
        reach(id, root) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id),
        cl AS (SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id)
        SELECT doc_id, cluster_id,
               CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'test'
                    ELSE 'val' END AS split
        FROM (SELECT doc_id, cluster_id,
                ((cluster_id + 42) * 2654435761 % 4294967296) / 4294967296.0 AS frac
              FROM cl)"""

  /** q138 oracle: the q92 pair replay joined against the q80 portable
    * Knuth-hash split; only cross-split pairs survive. */
  private val q138Sql =
    s"""WITH $q92Ctes,
        verified AS ($q92Select),
        sp AS (SELECT doc_id,
                 CASE WHEN frac < 0.8 THEN 'train'
                      WHEN frac < 0.9 THEN 'test'
                      ELSE 'val' END AS split
               FROM (SELECT doc_id,
                       ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0 AS frac
                     FROM documents))
        SELECT id_1, id_2, s1.split AS split_1, s2.split AS split_2, jaccard
        FROM verified
        JOIN sp s1 ON id_1 = s1.doc_id
        JOIN sp s2 ON id_2 = s2.doc_id
        WHERE s1.split <> s2.split"""

  private val q92Sql = s"WITH $q92Ctes\n$q92Select"

  /** Connected components over the q92 pair graph via recursive CTE:
    * min reachable doc_id = cluster id (matches the Spark side's
    * min-label propagation fixpoint). */
  private val q114Sql =
    s"""WITH RECURSIVE $q92Ctes,
        verified AS ($q92Select),
        edges AS (SELECT id_1 AS a, id_2 AS b FROM verified
                  UNION ALL SELECT id_2, id_1 FROM verified),
        reach(id, root) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.id)
        SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id"""

  /** q93 oracle: rebuild the md5-derived SimHash (two 32-bit words, 64
    * sign-sum bit aggregates) and compare ALL pairs on Hamming distance
    * — equal to the Spark side's banded search because 4×16-bit
    * pigeonhole banding is exact for distance ≤ 3. Distance decomposes
    * as bit_count(xor(lo)) + bit_count(xor(hi)) since the two words
    * occupy disjoint bit ranges of the 64-bit fingerprint. */
  private val q93Sql = {
    val bitSums = (0 until 64).map { i =>
      val h = if (i < 32) "hlo" else "hhi"
      s"sum(CASE WHEN ($h >> ${i % 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b_$i"
    }.mkString(", ")
    def word(range: Range, base: Int) = range
      .map(i => s"(CASE WHEN b_$i > 0 THEN (CAST(1 AS BIGINT) << ${i - base}) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" | ")
    s"""WITH $tokSql,
        h AS (SELECT id,
                CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS hlo,
                CAST(concat('0x', substr(md5(item), 9, 8)) AS BIGINT) AS hhi
              FROM tok),
        bits AS (SELECT id, $bitSums FROM h GROUP BY id),
        fp AS (SELECT id, ${word(0 until 32, 0)} AS lo, ${word(32 until 64, 32)} AS hi FROM bits)
        SELECT a.id AS id_1, b.id AS id_2,
               CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS distance
        FROM fp a JOIN fp b ON a.id < b.id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3"""
  }

  /** q146 oracle: the q93 fingerprint replay with the incremental
    * probe condition — only pairs involving ≥ 1 batch doc (doc_id %
    * 10 = 0) survive; old×old pairs are excluded exactly as the
    * asymmetric band join never generates them. */
  private val q146Sql =
    q93Sql + " AND (a.id % 10 = 0 OR b.id % 10 = 0)"

  /** q121 oracle: identical 13-gram construction, eval-side distinct,
    * overlap counts left-joined so clean documents keep their 0. */
  private val q121Sql = {
    val terms = (0 until 13).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
            FROM documents),
        sh AS (SELECT DISTINCT doc_id, $terms AS item
               FROM w, unnest(range(1, len(ws) - 11)) AS t(i)
               WHERE len(ws) >= 13),
        ev AS (SELECT DISTINCT item FROM sh WHERE doc_id % 50 = 0),
        ov AS (SELECT doc_id, count(*) AS n FROM sh JOIN ev USING (item)
               WHERE doc_id % 50 <> 0 GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n, 0) AS n_shared_ngrams,
               coalesce(n, 0) >= 1 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        LEFT JOIN ov USING (doc_id)"""
  }

  /** q126 oracle: identical footer plant, identical 8-gram / 60-bit
    * md5 id construction; duplicated-start coverage is re-derived by
    * exploding each start to its k positions and counting islands with
    * the pos − row_number() trick — a different but provably equal
    * formulation of the Scala side's sorted interval-merge fold. */
  private val q126Sql = {
    val terms = (0 until 8).map(j => if (j == 0) "ws[i]" else s"ws[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id,
              list_filter(string_split_regex(
                lower(text || ' all rights reserved contact the site operator for permission details'),
                '[^a-z0-9]+'), x -> x <> '') AS ws
            FROM documents),
        d AS (SELECT doc_id, ws, len(ws) AS n FROM w),
        g AS (SELECT doc_id, i AS s,
                CAST(concat('0x', substr(md5($terms), 1, 15)) AS BIGINT) AS gid
              FROM d, unnest(range(1, n - 6)) AS t(i)
              WHERE n >= 8),
        dup AS (SELECT gid FROM g GROUP BY gid HAVING count(*) >= 2),
        ds AS (SELECT g.doc_id, g.s FROM g JOIN dup USING (gid)),
        cov AS (SELECT DISTINCT doc_id, s + j AS p
                FROM ds, unnest(range(0, 8)) AS u(j)),
        isl AS (SELECT doc_id, p,
                  p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
                FROM cov),
        agg AS (SELECT doc_id, count(*) AS n_dup_tokens,
                  count(DISTINCT grp) AS n_spans
                FROM isl GROUP BY doc_id)
        SELECT d.doc_id, d.n AS n_tokens,
               coalesce(a.n_dup_tokens, 0) AS n_dup_tokens,
               coalesce(a.n_spans, 0) AS n_spans,
               coalesce(a.n_dup_tokens, 0) / d.n AS dup_frac,
               coalesce(a.n_dup_tokens, 0) / d.n <= 0.5 AS passes
        FROM d LEFT JOIN agg a USING (doc_id)"""
  }

  /** q128 oracle: q121's partition + 13-gram md5 ids, coverage by
    * explode-positions, surviving text rebuilt independently with an
    * ordered string_agg over the uncovered positions (empty-doc trap:
    * a fully-trimmed doc is absent from the rollup — coalesce to
    * ''/0, matching Spark's concat_ws on an empty array). */
  private val q128Sql = {
    val terms = (0 until 13).map(j => if (j == 0) "ws[i]" else s"ws[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
            FROM documents),
        d AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE doc_id % 50 <> 0),
        e AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE doc_id % 50 = 0),
        eg AS (SELECT DISTINCT
                 CAST(concat('0x', substr(md5($terms), 1, 15)) AS BIGINT) AS gid
               FROM e, unnest(range(1, n - 11)) AS t(i) WHERE n >= 13),
        g AS (SELECT doc_id, i AS s,
                CAST(concat('0x', substr(md5($terms), 1, 15)) AS BIGINT) AS gid
              FROM d, unnest(range(1, n - 11)) AS t(i) WHERE n >= 13),
        hs AS (SELECT g.doc_id, g.s FROM g JOIN eg USING (gid)),
        cov AS (SELECT DISTINCT doc_id, s + j AS p
                FROM hs, unnest(range(0, 13)) AS u(j)),
        tok AS (SELECT doc_id, ws[p] AS tok, p
                FROM d, unnest(range(1, n + 1)) AS t(p)),
        kept AS (SELECT tok.doc_id, tok.tok, tok.p
                 FROM tok LEFT JOIN cov
                   ON tok.doc_id = cov.doc_id AND tok.p = cov.p
                 WHERE cov.p IS NULL),
        roll AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
                   count(*) AS nk
                 FROM kept GROUP BY doc_id)
        SELECT d.doc_id, coalesce(roll.text, '') AS text, d.n AS n_tokens,
               coalesce(roll.nk, 0) AS n_kept_tokens
        FROM d LEFT JOIN roll USING (doc_id)"""
  }

  val oracles: Map[String, String] = Map(
    "q128_trim_contamination" -> q128Sql,
    "q126_repeated_spans" -> q126Sql,
    "q90_dedup_exact" ->
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 < 2)
         SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM all_docs GROUP BY md5(text)""",
    "q91_dedup_jaccard" -> jaccardSql(tokSql, "tok", 0.95),
    // q163: the brute-force ordered-pair containment replay over the
    // snippet-extended corpus — C(A→B) = |A∩B|/|A| on 3-gram shingles.
    "q163_containment" ->
      s"""WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000,
              array_to_string(list_slice(string_split(text, ' '), 1, 30), ' ')
            FROM documents WHERE doc_id % 11 = 0),
          w AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
                FROM docs),
          sh AS (SELECT DISTINCT doc_id AS id,
                        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS item
                 FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
                 WHERE len(ws) >= $N),
          sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
                    FROM sh a JOIN sh b ON a.item = b.item AND a.id <> b.id
                    GROUP BY 1, 2)
          SELECT id_a, id_b, CAST(i AS DOUBLE) / sz.sz AS containment
          FROM inter JOIN sz ON sz.id = id_a
          WHERE CAST(i AS DOUBLE) / sz.sz >= 0.9""",
    // q185: the BANDED containment replay, stage-for-stage — the
    // df ≤ 1000 universe cut (binding by design at scale; vacuous on
    // this fixture but replayed), the rarest-32 probe ordered by
    // (df, md5-derived 32-bit id, item), the k ≥ (0.9−0.2)·m candidate
    // count filter (CAST AS DOUBLE on both constants so DuckDB's
    // decimal literals don't round what Spark's constant-folded double
    // subtraction doesn't), then the exact verify over the FULL item
    // sets restricted to candidates.
    "q185_containment_banded" ->
      s"""WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000,
              array_to_string(list_slice(string_split(text, ' '), 1, 30), ' ')
            FROM documents WHERE doc_id % 11 = 0),
          w AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
                FROM docs),
          sh AS (SELECT DISTINCT doc_id AS id,
                        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS item
                 FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
                 WHERE len(ws) >= $N),
          freq AS (SELECT item, count(*) AS df FROM sh GROUP BY item),
          cold AS (SELECT s.id, s.item, f.df FROM sh s
                   JOIN freq f ON f.item = s.item WHERE f.df <= ${TextDedup.DefaultMaxItemDf}),
          ranked AS (SELECT id, item,
                       row_number() OVER (PARTITION BY id
                         ORDER BY df, CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT), item) AS rn,
                       count(*) OVER (PARTITION BY id) AS n
                     FROM cold),
          sketch AS (SELECT id AS id_a, least(n, 32) AS m, item
                     FROM ranked WHERE rn <= 32),
          cand AS (SELECT s.id_a, c.id AS id_b, s.m, count(*) AS k
                   FROM sketch s JOIN cold c ON s.item = c.item AND s.id_a <> c.id
                   GROUP BY 1, 2, 3),
          candf AS (SELECT id_a, id_b FROM cand
                    WHERE k >= (CAST(0.9 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * m),
          sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          inter AS (SELECT cf.id_a, cf.id_b, count(*) AS i
                    FROM candf cf
                    JOIN sh a ON a.id = cf.id_a
                    JOIN sh b ON b.id = cf.id_b AND b.item = a.item
                    GROUP BY 1, 2)
          SELECT i.id_a, i.id_b, CAST(i.i AS DOUBLE) / sz.sz AS containment
          FROM inter i JOIN sz ON sz.id = i.id_a
          WHERE CAST(i.i AS DOUBLE) / sz.sz >= 0.9""",
    // q191: the q163 pair replay + sizes + the (size desc, id asc)
    // keeper rule; survivors are the anti-join
    "q191_containment_dedup" ->
      s"""WITH docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000,
              array_to_string(list_slice(string_split(text, ' '), 1, 30), ' ')
            FROM documents WHERE doc_id % 11 = 0),
          w AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
                FROM docs),
          sh AS (SELECT DISTINCT doc_id AS id,
                        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS item
                 FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
                 WHERE len(ws) >= $N),
          sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
                    FROM sh a JOIN sh b ON a.item = b.item AND a.id <> b.id
                    GROUP BY 1, 2),
          pairs AS (SELECT id_a, id_b
                    FROM inter JOIN sz ON sz.id = id_a
                    WHERE CAST(i AS DOUBLE) / sz.sz >= 0.9),
          dropped AS (SELECT DISTINCT p.id_a
                      FROM pairs p
                      JOIN sz sa ON sa.id = p.id_a
                      JOIN sz sb ON sb.id = p.id_b
                      WHERE sb.sz > sa.sz OR (sb.sz = sa.sz AND p.id_b < p.id_a))
          SELECT id AS doc_id, CAST(sz AS BIGINT) AS n_items
          FROM sz WHERE id NOT IN (SELECT id_a FROM dropped)""",
    // q149: replay the paragraph construction, the (id, pos)-first
    // keeper rule, and the position-ordered reassembly exactly.
    "q149_paragraph_dedup" ->
      """WITH m AS (
           SELECT doc_id,
             regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g')
               || chr(10) || 'follow us on social media for more updates'
               || chr(10) || 'copyright example corp all rights reserved'
               || chr(10) || 'more stories from source ' || source AS mt
           FROM documents),
         p0 AS (
           SELECT doc_id,
             list_filter(string_split_regex(mt, '\n+'), p -> p <> '') AS paras
           FROM m),
         p AS (
           SELECT doc_id, len(paras) AS n_par,
             CAST(i AS BIGINT) AS pos, paras[i + 1] AS para
           FROM p0, unnest(range(0, len(paras))) AS t(i)),
         k AS (
           SELECT doc_id, n_par, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
           FROM p)
         SELECT doc_id,
           string_agg(para, chr(10) ORDER BY pos) AS clean_text,
           CAST(max(n_par) AS BIGINT) AS n_paragraphs,
           CAST(count(*) AS BIGINT) AS n_kept
         FROM k WHERE rn = 1 GROUP BY doc_id""",
    // q150: q149's construction, membership by the portable 60-bit
    // md5 hash exactly as Spark (store = history's distinct hashes),
    // then the within-batch first-wins rule and ordered reassembly.
    "q150_incremental_paragraphs" ->
      """WITH m AS (
           SELECT doc_id,
             regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1' || chr(10), 'g')
               || chr(10) || 'follow us on social media for more updates'
               || chr(10) || 'copyright example corp all rights reserved'
               || chr(10) || 'more stories from source ' || source AS mt
           FROM documents),
         p0 AS (
           SELECT doc_id,
             list_filter(string_split_regex(mt, '\n+'), p -> p <> '') AS paras
           FROM m),
         p AS (
           SELECT doc_id, len(paras) AS n_par,
             CAST(i AS BIGINT) AS pos, paras[i + 1] AS para,
             CAST(concat('0x', substr(md5(paras[i + 1]), 1, 15)) AS BIGINT) AS ph
           FROM p0, unnest(range(0, len(paras))) AS t(i)),
         store AS (SELECT DISTINCT ph FROM p WHERE doc_id % 10 <> 0),
         f AS (
           SELECT * FROM p WHERE doc_id % 10 = 0
             AND ph NOT IN (SELECT ph FROM store)),
         k AS (
           SELECT doc_id, n_par, pos, para,
             row_number() OVER (PARTITION BY ph ORDER BY doc_id, pos) AS rn
           FROM f)
         SELECT doc_id,
           string_agg(para, chr(10) ORDER BY pos) AS clean_text,
           CAST(max(n_par) AS BIGINT) AS n_paragraphs,
           CAST(count(*) AS BIGINT) AS n_kept
         FROM k WHERE rn = 1 GROUP BY doc_id""",
    "q92_dedup_minhash" -> q92Sql,
    "q138_split_leakage" -> q138Sql,
    "q139_cluster_split" -> q139Sql,
    "q93_dedup_simhash" -> q93Sql,
    "q146_incremental_fingerprint" -> q146Sql,
    "q94_dedup_ngram" -> jaccardSql(shSql, "sh", 0.5),
    "q125_dedup_prefix" -> jaccardSql(shSql, "sh", 0.8),
    "q114_dedup_clusters" -> q114Sql,
    "q121_decontaminate" -> q121Sql,
    "q123_incremental_dedup" -> q123Sql,
    "q124_url_dedup" -> q124Sql,
    "q153_bloom_url_seen" -> q153Sql,
    "q119_line_boilerplate" ->
      """WITH m AS (
           SELECT doc_id,
             regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1.' || chr(10), 'g') ||
               chr(10) || 'all rights reserved contact us at example dot com.' AS mt
           FROM documents),
         dl AS (
           SELECT DISTINCT doc_id, line FROM (
             SELECT doc_id, trim(l) AS line
             FROM m, unnest(string_split_regex(mt, '\r?\n')) AS t(l))
           WHERE line <> ''),
         lc AS (SELECT line, count(*) AS n_docs FROM dl GROUP BY line),
         ru AS (
           SELECT doc_id, count(*) AS nl,
             count(CASE WHEN n_docs >= 2 THEN 1 END) AS nb
           FROM dl JOIN lc USING (line)
           GROUP BY doc_id)
         SELECT d.doc_id, coalesce(nl, 0) AS n_lines,
           coalesce(nb, 0) AS n_boilerplate_lines,
           coalesce(nb * 1.0 / nl, 0.0) AS boilerplate_frac,
           coalesce(nb * 1.0 / nl <= 0.3, true) AS passes
         FROM documents d LEFT JOIN ru USING (doc_id)""")
}
