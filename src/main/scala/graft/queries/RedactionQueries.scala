package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.medallion.Silver
import graft.services.{Qa, Redaction}
import graft.services.Redaction.EntityPattern

/** Redaction + QA queries (q50, q51, q60) + DuckDB oracles.
  *
  * q50/q51 synthesize PII deterministically from `customer` (every row
  * gets an email; %3 a phone, %5 an SSN, %7 an IP) so redaction counts
  * are data-derived, then run the column-expression redaction engine;
  * the oracle rebuilds the identical text and applies the same
  * pattern chain with DuckDB's global regexp_replace.
  */
object RedactionQueries {

  type Q = (SparkSession, String) => DataFrame

  private val patterns = Seq(
    EntityPattern("email", Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"), priority = 10),
    EntityPattern("ssn", Seq("\\d{3}-\\d{2}-\\d{4}"), priority = 9),
    EntityPattern("phone", Seq("\\d{3}-\\d{3}-\\d{4}"), priority = 8),
    EntityPattern("ip_address", Seq("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), priority = 6))

  /** The Dolma triple (email/phone/IP) for the q162 corpus scrub. */
  private val scrubPatterns = Seq(
    EntityPattern("email", Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"), priority = 10),
    EntityPattern("phone", Seq("\\d{3}-\\d{3}-\\d{4}"), priority = 8),
    EntityPattern("ip_address", Seq("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"), priority = 6))

  private def piiText(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    val ks = k.cast("string")
    Tables.customer(s, d).select(
      k.as("c_custkey"),
      concat(
        lit("Contact "), col("c_name"), lit(" at user"), ks, lit("@example.com"),
        when(k % 3 === 0, concat(lit(" phone 555-"),
          lpad((k % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((k % 10000).cast("string"), 4, "0"))).otherwise(""),
        when(k % 5 === 0, concat(lit(" ssn "),
          lpad((k % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((k % 100).cast("string"), 2, "0"), lit("-"),
          lpad((k % 10000).cast("string"), 4, "0"))).otherwise(""),
        when(k % 7 === 0, concat(lit(" ip 10."),
          (k % 256).cast("string"), lit(".0."), (k % 100).cast("string"))).otherwise(""))
        .as("text"))
  }

  private val piiTextSql =
    """pii AS (
         SELECT c_custkey,
           'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) || '@example.com'
           || CASE WHEN c_custkey % 3 = 0 THEN ' phone 555-'
                || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN c_custkey % 5 = 0 THEN ' ssn '
                || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-'
                || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN c_custkey % 7 = 0 THEN ' ip 10.'
                || CAST(c_custkey % 256 AS VARCHAR) || '.0.'
                || CAST(c_custkey % 100 AS VARCHAR) ELSE '' END
           AS text
         FROM customer)"""

  /** The reference default pattern sets, shared verbatim between the
    * Spark query and the generated oracle SQL. */
  private val localePatterns = Redaction.TemporalPatterns ++ Redaction.LocationPatterns
  private def terms(name: String): Seq[String] =
    localePatterns.find(_.name == name).get.patterns
  private val localeDays = terms("day")
  private val localeMonths = terms("month")
  private val localeStates = terms("state")
  private val localeCities = terms("city")

  val queries: Map[String, Q] = Map(
    "q50_redact" -> ((s, d) =>
      piiText(s, d).select(
        col("c_custkey"),
        Redaction.redactColumn(col("text"), patterns).as("text_redacted"))),

    "q51_entity_counts" -> ((s, d) =>
      Redaction.entityCounts(piiText(s, d), "text", patterns)),

    // qa.py:293 verify_entity_counts: per-entity before/after count
    // reconciliation across the redaction — counts from two aggregate
    // scans, reconciliation arithmetic over a pattern-sized frame
    "q61_entity_verify" -> ((s, d) => {
      val before = piiText(s, d)
      val after = before.select(col("c_custkey"),
        Redaction.redactColumn(col("text"), patterns).as("text"))
      Qa.verifyEntityCounts(
        Redaction.entityCounts(before, "text", patterns),
        Redaction.entityCounts(after, "text", patterns))
    }),

    // Training-corpus PII scrub (full DuckDB oracle): the Dolma-pass
    // shape over the documents table — emails, phones and IPs planted
    // deterministically on residue classes, masked with entity tags,
    // per-doc counts measured BEFORE replacement. A narrow map-only
    // projection; the oracle replays plant, chain and counts.
    "q162_pii_scrub" -> ((s, d) => {
      val k = col("doc_id")
      val planted = Tables.documents(s, d).select(
        k.as("doc_id"),
        concat(
          col("text"),
          when(k % 3 === 0, concat(lit(" contact user"), k.cast("string"),
            lit("@mail.example.org"))).otherwise(""),
          when(k % 5 === 0, concat(lit(" call 555-"),
            lpad((k % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((k % 10000).cast("string"), 4, "0"))).otherwise(""),
          when(k % 7 === 0, concat(lit(" from 192.168."),
            (k % 256).cast("string"), lit("."), (k % 100).cast("string")))
            .otherwise("")).as("text"))
      Redaction.scrubTexts(planted, "doc_id", "text", scrubPatterns)
    }),

    // Temporal + location redaction (full DuckDB oracle): the
    // reference's with_temporal_patterns / with_location_patterns
    // defaults (redaction.py:163/:209) — weekday/month words, three
    // numeric date shapes, US states and major cities, whole-word and
    // case-insensitive — over documents with deterministically planted
    // mentions. Same map-only scrub shape as q162; the oracle replays
    // the generated pattern chain and pre-replacement counts from THE
    // SAME EntityPattern vals, so Spark and SQL can never drift apart
    // on the pattern text.
    "q184_redact_locales" -> ((s, d) => {
      val k = col("doc_id")
      def pick(terms: Seq[String], m: Int) =
        element_at(array(terms.map(lit): _*), (k % m).cast("int") + 1)
      val planted = Tables.documents(s, d).select(
        k.as("doc_id"),
        concat(
          col("text"),
          lit(" posted "), pick(localeDays, 7),
          lit(" "), pick(localeMonths, 12),
          lit(" 2024-"), lpad((k % 12 + 1).cast("string"), 2, "0"),
          lit("-"), lpad((k % 28 + 1).cast("string"), 2, "0"),
          when(k % 3 === 0, concat(lit(" meeting "), (k % 12 + 1).cast("string"),
            lit("/"), (k % 28 + 1).cast("string"), lit("/2024"))).otherwise(""),
          when(k % 2 === 0, concat(lit(" in "), pick(localeCities, 30),
            lit(", "), pick(localeStates, localeStates.size))).otherwise("")).as("text"))
      Redaction.scrubTexts(planted, "doc_id", "text", localePatterns)
    }),

    "q60_qa_compare" -> ((s, d) => {
      val before = Tables.events(s, d).select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_id") % 13 === 0, lit(null)).otherwise(col("value")).as("value"),
        col("props"))
      val after = Silver.filterInvalid(before, Seq("value"))
      Qa.compare(before, after, keyColumns = Seq("event_id"))
    }))

  private val q50Sql = {
    // identical priority order: email, ssn, phone, ip — each global.
    // SQL single-quoted strings are escape-free, so regex backslashes
    // embed verbatim.
    val chain = patterns.foldLeft("text") { (acc, p) =>
      s"regexp_replace($acc, '${p.patterns.head}', '${p.tagText}', 'g')"
    }
    s"WITH $piiTextSql SELECT c_custkey, $chain AS text_redacted FROM pii"
  }

  private val q51Sql = {
    val sels = patterns.map { p =>
      // CAST: DuckDB sums to HUGEINT, Spark's count is BIGINT — the
      // driver hashes typed values, so align the oracle to BIGINT.
      s"""SELECT '${p.name}' AS entity,
          CAST(sum(len(regexp_extract_all(text, '${p.patterns.head}'))) AS BIGINT) AS n_matches FROM pii"""
    }.mkString("\nUNION ALL\n")
    s"WITH $piiTextSql\n$sels"
  }

  private val q61Sql = {
    val chain = patterns.foldLeft("text") { (acc, p) =>
      s"regexp_replace($acc, '${p.patterns.head}', '${p.tagText}', 'g')"
    }
    def counts(src: String) = patterns.map { p =>
      s"""SELECT '${p.name}' AS entity,
          CAST(sum(len(regexp_extract_all(text, '${p.patterns.head}'))) AS BIGINT) AS n
          FROM $src"""
    }.mkString("\nUNION ALL\n")
    s"""WITH $piiTextSql,
        red AS (SELECT $chain AS text FROM pii),
        b AS (${counts("pii")}),
        a AS (${counts("red")}),
        j AS (SELECT b.entity, b.n AS n_before, a.n AS n_after
              FROM b JOIN a USING (entity))
        SELECT entity, n_before, n_after,
          CASE WHEN n_before > 0
               THEN (n_before - n_after) * 100.0 / n_before END AS reduction_pct,
          n_after = 0 AS passed
        FROM (
          SELECT entity, n_before, n_after FROM j
          UNION ALL
          SELECT '_total', CAST(sum(n_before) AS BIGINT), CAST(sum(n_after) AS BIGINT) FROM j)"""
  }

  private val q60Sql = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    def side(t: String) =
      s"(SELECT count(*) AS n, " +
        cols.map(c => s"count(*) - count($c) AS n_$c").mkString(", ") +
        s", count(*) - count(DISTINCT event_id) AS dups FROM $t)"
    val rows =
      s"""SELECT 'row_count' AS "check", b.n AS "before", a.n AS "after" FROM b, a""" +:
        cols.map(c => s"""SELECT 'nulls_$c', b.n_$c, a.n_$c FROM b, a""") :+
        s"""SELECT 'duplicates_event_id', b.dups, a.dups FROM b, a"""
    s"""WITH before_t AS (
          SELECT event_id, ts, user_id, event_type,
                 CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value, props
          FROM events),
        after_t AS (SELECT * FROM before_t WHERE value IS NOT NULL),
        b AS ${side("before_t")},
        a AS ${side("after_t")}
        ${rows.mkString("\nUNION ALL\n")}"""
  }

  private val q162Sql = {
    val chain = scrubPatterns.foldLeft("text") { (acc, p) =>
      s"regexp_replace($acc, '${p.patterns.head}', '${p.tagText}', 'g')"
    }
    val counts = scrubPatterns.map { p =>
      s"CAST(len(regexp_extract_all(text, '${p.patterns.head}')) AS BIGINT) AS n_${p.name}"
    }.mkString(",\n           ")
    val total = scrubPatterns.map(p => s"n_${p.name}").mkString(" + ")
    s"""WITH pii AS (
         SELECT doc_id, text
           || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.org' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
           AS text
         FROM documents),
       c AS (
         SELECT doc_id, text,
           $counts
         FROM pii)
       SELECT doc_id, $chain AS text,
         n_email, n_phone, n_ip_address,
         $total AS n_pii
       FROM c"""
  }

  private val q184Sql = {
    def sqlList(ts: Seq[String]) = ts.map(t => s"'$t'").mkString("[", ", ", "]")
    // generated from the SAME compiled chain as the Spark query (the
    // grouped-alternation passes): pattern strings embed verbatim in
    // single-quoted SQL strings, so the two engines can never drift
    val chain = Redaction.compiledChain(localePatterns)
      .foldLeft("text") { case (acc, (p, pat)) =>
        s"regexp_replace($acc, '$pat', '${p.tagText}', 'g')"
      }
    val counts = localePatterns.map { p =>
      val sum = Redaction.groupedPatterns(p)
        .map(pat => s"len(regexp_extract_all(text, '$pat'))").mkString(" + ")
      s"CAST($sum AS BIGINT) AS n_${p.name}"
    }.mkString(",\n           ")
    val total = localePatterns.map(p => s"n_${p.name}").mkString(" + ")
    s"""WITH pl AS (
         SELECT doc_id, text
           || ' posted ' || (${sqlList(localeDays)})[CAST(doc_id % 7 AS INT) + 1]
           || ' ' || (${sqlList(localeMonths)})[CAST(doc_id % 12 AS INT) + 1]
           || ' 2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
           || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
           || CASE WHEN doc_id % 3 = 0 THEN ' meeting ' || CAST(doc_id % 12 + 1 AS VARCHAR)
                || '/' || CAST(doc_id % 28 + 1 AS VARCHAR) || '/2024' ELSE '' END
           || CASE WHEN doc_id % 2 = 0 THEN ' in ' || (${sqlList(localeCities)})[CAST(doc_id % 30 AS INT) + 1]
                || ', ' || (${sqlList(localeStates)})[CAST(doc_id % ${localeStates.size} AS INT) + 1] ELSE '' END
           AS text
         FROM documents),
       c AS (
         SELECT doc_id, text,
           $counts
         FROM pl)
       SELECT doc_id, $chain AS text,
         n_date, n_day, n_month, n_state, n_city,
         $total AS n_pii
       FROM c"""
  }

  val oracles: Map[String, String] = Map(
    "q50_redact" -> q50Sql,
    "q184_redact_locales" -> q184Sql,
    "q51_entity_counts" -> q51Sql,
    "q61_entity_verify" -> q61Sql,
    "q60_qa_compare" -> q60Sql,
    "q162_pii_scrub" -> q162Sql)
}
