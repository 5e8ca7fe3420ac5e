package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.services.CorpusPipeline

/** q180 — the end-to-end corpus pipeline under the FULL hash gate.
  *
  * CorpusPipelineSpec proves the composition's kill-behavior; this
  * query makes the COMPOSITION an artifact fact: extract (q148's block
  * algebra) → C4 hygiene (q118's rules) → paragraph dedup (q149's
  * keeper rule) → unigram-LM scoring (q129's micro-nat grid) → split
  * assignment (q80's portable hash), fused as one dataflow, replayed
  * CTE-for-CTE in DuckDB. Fusion bugs — column collisions, null
  * propagation across stages, a stage reading a pre-dedup column —
  * are exactly what the per-stage gates can't see and this one does.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q180_corpus_pipeline" -> ((s, d) =>
      CorpusPipeline.curate(
        Tables.documents(s, d).select(col("doc_id"),
          WebQueries.fixturePage.as("html")),
        "doc_id", "html",
        // the corpus is punctuation-free word soup: manufacture the
        // line structure (the q118 fixture trick) so the C4 rules
        // have sentences to judge
        lineate = c => regexp_replace(c, "((\\S+\\s+){7}\\S+)\\s+", "$1.\n"))))

  // ---- oracle: the stage oracles chained as CTEs ------------------
  // plain concatenation, NOT s-interpolation: the SQL carries regex
  // escapes (\s, \1) the s-interpolator would reject.

  private val q180Sql =
    "WITH " + WebQueries.fixtureExtractSql + ",\n" +
    """ext AS (
         SELECT doc_id,
           array_to_string(list_transform(list_filter(st, s -> s.content), s -> s.txt), ' ') AS main_text
         FROM s2),
       sen AS (
         SELECT doc_id,
           regexp_replace(main_text, '((\S+\s+){7}\S+)\s+', '\1.' || chr(10), 'g') AS mt
         FROM ext),
       lns AS (
         SELECT doc_id, mt,
           list_filter(list_transform(string_split_regex(mt, '\r?\n'), x -> trim(x)), x -> x <> '') AS lines
         FROM sen),
       kept AS (
         SELECT doc_id, mt,
           list_filter(lines, x -> regexp_matches(x, '[.!?"]$')
             AND len(string_split_regex(x, ' +')) >= 5
             AND NOT contains(lower(x), 'javascript')) AS kl
         FROM lns),
       filt AS (
         SELECT doc_id, coalesce(array_to_string(kl, chr(10)), '') AS text
         FROM kept
         WHERE len(regexp_extract_all(coalesce(array_to_string(kl, chr(10)), ''), '[.!?]')) >= 3
           AND NOT contains(lower(mt), 'lorem ipsum')
           AND NOT contains(mt, '{')),
       p0 AS (
         SELECT doc_id,
           list_filter(string_split_regex(text, '\n+'), p -> p <> '') AS paras
         FROM filt),
       p AS (
         SELECT doc_id, CAST(i AS BIGINT) AS pos, paras[i + 1] AS para
         FROM p0, unnest(range(0, len(paras))) AS t(i)),
       kp AS (
         SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         FROM p),
       ded AS (
         SELECT doc_id,
           string_agg(para, chr(10) ORDER BY pos) AS text,
           CAST(count(*) AS BIGINT) AS n_kept
         FROM kp WHERE rn = 1 GROUP BY doc_id),
       dtok AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
         FROM ded),
       model AS (
         SELECT token, count(*) AS cnt
         FROM (SELECT unnest(tk) AS token FROM dtok)
         GROUP BY token),
       dval AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM model),
       tok AS (SELECT doc_id, unnest(tk) AS token FROM dtok),
       j AS (
         SELECT doc_id, cnt IS NULL AS oov,
           CAST(floor(ln(CAST((SELECT d FROM dval) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             - CAST(floor(ln(CAST((coalesce(cnt, 0) + 1) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS nll
         FROM tok LEFT JOIN model USING (token)),
       a AS (
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(nll) AS BIGINT) AS sum_nll_micro
         FROM j GROUP BY doc_id),
       fin AS (
         SELECT ded.doc_id, ded.text, ded.n_kept,
           a.n_tokens, a.n_oov, a.sum_nll_micro,
           a.sum_nll_micro * 1.0 / a.n_tokens AS avg_nll_micro
         FROM ded JOIN a USING (doc_id))
       SELECT doc_id, text, n_kept, n_tokens, n_oov, sum_nll_micro, avg_nll_micro,
         CASE WHEN frac < 0.8 THEN 'train'
              WHEN frac < 0.9 THEN 'test'
              ELSE 'val' END AS split
       FROM (SELECT *,
               ((doc_id + 42) * 2654435761 % 4294967296) / 4294967296.0 AS frac
             FROM fin)"""

  val oracles: Map[String, String] = Map(
    "q180_corpus_pipeline" -> q180Sql)
}
