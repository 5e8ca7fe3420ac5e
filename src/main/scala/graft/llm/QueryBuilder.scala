package graft.llm

import org.apache.spark.sql.DataFrame

/** The deterministic core of the reference's NL→SQL assistant
  * (ref llm/query_builder.py:31 `QueryBuilder`,
  * llm/sql_assistant.py:251 `SQLAssistant`).
  *
  * The reference routes every capability — generation, explanation,
  * optimization, index suggestion, validation — through an LLM call.
  * Everything EXCEPT free-text generation is actually deterministic
  * logic over the registered schemas and the SQL string, so it is
  * implemented for real here and unit-tested; generation itself stays
  * behind the [[Nl2Sql]] seam ([[RuleBasedNl2Sql]] default) exactly
  * like `llm/SchemaInference`. A caller with a live model plugs it in
  * without touching the guardrails — which is the point: the SAFETY
  * layer (sql_assistant.py:548 `_security_check`) must not depend on
  * the model it is guarding.
  */
object QueryBuilder {

  /** sql_assistant.py:36 `TableSchema` — columns are (name, type) in
    * declaration order; `tier` gates access like the reference's
    * bronze/silver/gold ACL. */
  final case class TableSchema(
      name: String,
      columns: Seq[(String, String)],
      description: String = "",
      tier: String = "silver",
      partitionColumns: Seq[String] = Seq.empty)

  /** query_builder.py:18 `QueryResult` + sql_assistant.py:101
    * `SQLGenerationResult`, merged to the deterministic fields. */
  final case class QueryResult(
      sql: String,
      explanation: String,
      tablesUsed: Seq[String],
      complexity: String,
      warnings: Seq[String],
      isValid: Boolean,
      isSafe: Boolean,
      requiresConfirmation: Boolean)

  /** query_builder.py:268 `validate_query` response shape. */
  final case class Validation(
      isValid: Boolean,
      isSafe: Boolean,
      syntaxIssues: Seq[String],
      semanticIssues: Seq[String],
      performanceIssues: Seq[String],
      securityIssues: Seq[String])

  /** query_builder.py:224 `suggest_indexes` response shape (Iceberg
    * sort-order vocabulary). */
  final case class IndexSuggestion(
      sortColumns: Seq[String],
      partitionColumns: Seq[String],
      zOrderColumns: Seq[String],
      reasoning: String)

  /** query_builder.py:179 `optimize_query` response shape. */
  final case class Optimization(
      optimizedSql: String,
      changesMade: Seq[String],
      warnings: Seq[String])

  // sql_assistant.py:557 dangerous_patterns — statement kinds a
  // read-only analytics seam must never pass through.
  private val DangerousOps = Seq(
    "drop", "truncate", "delete", "alter", "create",
    "insert", "update", "grant", "revoke")

  // sql_assistant.py:578 injection_patterns.
  private val InjectionPatterns = Seq(
    (";\\s*--", "statement terminator followed by comment"),
    ("'\\s*or\\s*'", "quoted OR short-circuit"),
    ("'\\s*;", "quote followed by statement terminator"),
    ("\\bexec\\s*\\(", "dynamic execution call"))

  private def word(w: String) = s"(?i)(?<![a-z0-9_])$w(?![a-z0-9_])".r

  /** Strip string literals and comments so guardrail scans can't be
    * confused by (or miss) content inside them — the scan sees the
    * STRUCTURE of the statement only. */
  private[llm] def stripLiterals(sql: String): String = sql
    .replaceAll("'([^']|'')*'", "'?'")
    .replaceAll("--[^\\n]*", "")
    .replaceAll("(?s)/\\*.*?\\*/", "")

  /** Tables referenced in FROM / JOIN clauses (lowercased). */
  private[llm] def referencedTables(sql: String): Seq[String] = {
    val s = stripLiterals(sql).toLowerCase
    "(?:\\bfrom|\\bjoin)\\s+([a-z_][a-z0-9_.]*)".r
      .findAllMatchIn(s).map(_.group(1)).toSeq.distinct
  }
}

/** Stateful registry + deterministic capabilities. One instance per
  * assistant session (the reference holds `_table_schemas` the same
  * way, sql_assistant.py:261). */
final class QueryBuilder(
    generator: Nl2Sql = RuleBasedNl2Sql,
    allowedTiers: Set[String] = Set("bronze", "silver", "gold")) {

  import QueryBuilder._

  private val schemas = scala.collection.mutable.LinkedHashMap.empty[String, TableSchema]

  /** query_builder.py:48 `register_table`. */
  def registerTable(schema: TableSchema): Unit =
    schemas(schema.name.toLowerCase) = schema

  /** query_builder.py:67 `register_dataframe` — schema straight off
    * the Spark plan, no data touched. */
  def registerDataFrame(
      name: String, df: DataFrame, description: String = "",
      tier: String = "silver"): Unit =
    registerTable(TableSchema(
      name, df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString),
      description, tier))

  def registeredTables: Seq[String] = schemas.values.map(_.name).toSeq

  /** query_builder.py:84 `build_query`: generate through the seam,
    * then run the full deterministic guardrail stack over the result —
    * exactly the reference's generate-then-`_security_check` order
    * (sql_assistant.py:340,548). */
  def buildQuery(naturalQuery: String, tables: Seq[String] = Seq.empty): QueryResult = {
    val candidates =
      if (tables.nonEmpty) tables.map(_.toLowerCase) else schemas.keys.toSeq
    require(candidates.nonEmpty, "No tables registered. Use registerTable() first.")
    val primary = schemas.getOrElse(candidates.head,
      throw new IllegalArgumentException(
        s"Unknown table '${candidates.head}'. Registered tables: " +
          (if (schemas.isEmpty) "(none)" else schemas.values.map(_.name).mkString(", "))))
    val sql = generator.toSql(naturalQuery, primary.name, primary.columns.map(_._1))
    val v = validateQuery(sql)
    QueryResult(
      sql = sql,
      explanation = explainQuery(sql),
      tablesUsed = referencedTables(sql),
      complexity = complexity(sql),
      warnings = v.securityIssues ++ v.semanticIssues ++ v.performanceIssues,
      isValid = v.isValid,
      isSafe = v.isSafe,
      requiresConfirmation = !v.isSafe)
  }

  /** sql_assistant.py:548 `_security_check` + query_builder.py:268
    * `validate_query`, as one deterministic pass. isValid = structure
    * parses and references resolve; isSafe = no dangerous op /
    * injection shape / tier violation. */
  def validateQuery(sql: String): Validation = {
    val stripped = stripLiterals(sql)
    val lower = stripped.toLowerCase

    val syntax = Seq.newBuilder[String]
    if (sql.trim.isEmpty) syntax += "empty statement"
    else if (word("select").findFirstIn(lower).isEmpty)
      syntax += "not a SELECT statement"
    if (stripped.count(_ == '(') != stripped.count(_ == ')'))
      syntax += "unbalanced parentheses"
    if (stripped.replace("'?'", "").contains("'"))
      syntax += "unterminated string literal"

    val security = Seq.newBuilder[String]
    DangerousOps.foreach { op =>
      if (word(op).findFirstIn(lower).isDefined)
        security += s"dangerous operation: $op"
    }
    InjectionPatterns.foreach { case (p, what) =>
      // injection shapes live in the RAW text — quoting tricks are
      // exactly what stripping would erase
      if (p.r.findFirstIn(sql.toLowerCase).isDefined)
        security += s"injection pattern: $what"
    }

    val semantic = Seq.newBuilder[String]
    val refs = referencedTables(sql)
    refs.foreach { t =>
      schemas.get(t) match {
        case None => semantic += s"unknown table: $t"
        case Some(ts) if !allowedTiers.contains(ts.tier) =>
          security += s"access denied to ${ts.tier} tier table: $t"
        case _ => ()
      }
    }

    val perf = Seq.newBuilder[String]
    if ("(?i)select\\s+\\*".r.findFirstIn(lower).isDefined)
      perf += "SELECT * reads every column — project only what you need (column pruning)"
    if (word("limit").findFirstIn(lower).isEmpty &&
        word("group").findFirstIn(lower).isEmpty &&
        "(?i)\\bcount\\s*\\(|\\bsum\\s*\\(|\\bavg\\s*\\(|\\bmin\\s*\\(|\\bmax\\s*\\(".r.findFirstIn(lower).isEmpty)
      perf += "unbounded row scan — add LIMIT or an aggregate"
    if ("(?i)like\\s+'%".r.findFirstIn(sql.toLowerCase).isDefined)
      perf += "leading-wildcard LIKE defeats predicate pushdown"
    if ("(?i)from\\s+[a-z0-9_.]+\\s*,\\s*[a-z0-9_.]+".r.findFirstIn(lower).isDefined)
      perf += "comma join — use explicit JOIN ... ON to avoid an accidental cartesian"
    refs.flatMap(schemas.get).foreach { ts =>
      if (ts.partitionColumns.nonEmpty &&
          !ts.partitionColumns.exists(p => word(p).findFirstIn(lower).isDefined))
        perf += s"no filter on ${ts.name}'s partition columns (${ts.partitionColumns.mkString(", ")}) — full-table scan"
    }

    val (sy, se, pe, sec) = (syntax.result(), semantic.result(), perf.result(), security.result())
    Validation(sy.isEmpty && se.isEmpty, sec.isEmpty, sy, se, pe, sec)
  }

  /** query_builder.py:150 `explain_query` — the reference asks a model
    * for "overall / step-by-step / returns / performance"; the same
    * four sections render deterministically from the clause structure. */
  def explainQuery(sql: String): String = {
    val s = stripLiterals(sql)
    def clause(kw: String, stop: String): Option[String] =
      s"(?is)\\b$kw\\b\\s+(.*?)(?=$stop|$$)".r.findFirstMatchIn(s)
        .map(_.group(1).trim.replaceAll("\\s+", " "))
    val stops = "\\bfrom\\b|\\bwhere\\b|\\bgroup\\s+by\\b|\\bhaving\\b|\\border\\s+by\\b|\\blimit\\b|\\bjoin\\b|\\bon\\b"
    val cols = clause("select", stops).getOrElse("*")
    val tables = referencedTables(sql)
    val steps = Seq.newBuilder[String]
    steps += s"Reads from ${if (tables.isEmpty) "an inline relation" else tables.mkString(", ")}."
    if (word("join").findFirstIn(s.toLowerCase).isDefined)
      steps += "Joins the tables on the given keys."
    clause("where", stops).foreach(w => steps += s"Keeps rows where $w.")
    clause("group\\s+by", stops).foreach(g => steps += s"Groups rows by $g and computes the aggregates.")
    clause("having", stops).foreach(h => steps += s"Keeps groups where $h.")
    clause("order\\s+by", stops).foreach(o => steps += s"Sorts the result by $o.")
    clause("limit", stops).foreach(l => steps += s"Returns at most $l rows.")
    steps += s"Returns: $cols."
    steps.result().zipWithIndex.map { case (t, i) => s"${i + 1}. $t" }.mkString("\n")
  }

  /** Complexity rating (query_builder.py `estimated_complexity`):
    * joins/subqueries/windows ⇒ high, single-table aggregation ⇒
    * medium, plain scan ⇒ low. */
  def complexity(sql: String): String = {
    val s = stripLiterals(sql).toLowerCase
    val joins = word("join").findAllIn(s).size
    val subqueries = "\\(\\s*select".r.findAllIn(s).size
    val windows = word("over").findAllIn(s).size
    if (joins >= 2 || subqueries >= 1 || windows >= 1) "high"
    else if (joins == 1 || word("group").findFirstIn(s).isDefined) "medium"
    else "low"
  }

  /** query_builder.py:179 `optimize_query` — the deterministic subset:
    * each suggestion is a rewrite the optimizer prompt asks the model
    * for, applied only when it provably preserves semantics (SELECT *
    * expansion from the registered schema; everything else stays a
    * recorded suggestion, not a silent rewrite). */
  def optimizeQuery(sql: String): Optimization = {
    val changes = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    var out = sql
    val refs = referencedTables(sql)
    if ("(?i)select\\s+\\*\\s+from".r.findFirstIn(sql).isDefined)
      refs.headOption.flatMap(schemas.get) match {
        case Some(ts) if refs.size == 1 =>
          out = out.replaceAll("(?i)select\\s+\\*",
            "SELECT " + ts.columns.map(_._1).mkString(", "))
          changes += s"expanded SELECT * to ${ts.name}'s ${ts.columns.size} declared columns (column pruning)"
        case _ =>
          warnings += "SELECT * over an unregistered or multi-table FROM — cannot expand safely"
      }
    val v = validateQuery(out)
    v.performanceIssues.foreach(warnings += _)
    Optimization(out, changes.result(), warnings.result().distinct)
  }

  /** query_builder.py:224 `suggest_indexes` — deterministic heuristic
    * from the query's own predicate structure: equality-filter columns
    * lead the sort order (then range columns), time/date partition
    * candidates come from range predicates, multiple range columns ⇒
    * z-order. */
  def suggestIndexes(sql: String, tableName: String): IndexSuggestion = {
    val ts = schemas.getOrElse(tableName.toLowerCase,
      throw new IllegalArgumentException(s"Table $tableName not registered"))
    val s = stripLiterals(sql).toLowerCase
    val cols = ts.columns.map(_._1.toLowerCase)
    def filtered(op: String): Seq[String] =
      cols.filter(c => s"(?<![a-z0-9_])$c\\s*$op".r.findFirstIn(s).isDefined)
    val eq = filtered("=(?!=)").distinct
    val range = (filtered("[<>]") ++ filtered("between\\s")).distinct.filterNot(eq.contains)
    val grouped = cols.filter { c =>
      "(?s)group\\s+by\\s+(.*?)(?=having|order|limit|$)".r.findFirstMatchIn(s)
        .exists(m => s"(?<![a-z0-9_])$c(?![a-z0-9_])".r.findFirstIn(m.group(1)).isDefined)
    }
    val timeish = ts.columns.collect {
      case (n, t) if Seq("date", "timestamp").exists(t.toLowerCase.contains) => n.toLowerCase
    }
    IndexSuggestion(
      sortColumns = (eq ++ range ++ grouped).distinct,
      partitionColumns = (range.filter(timeish.contains) ++ eq.filterNot(timeish.contains)).distinct.take(2),
      zOrderColumns = if (range.size >= 2) range else Seq.empty,
      reasoning = s"equality filters (${eq.mkString(",")}) lead the sort order, " +
        s"range filters (${range.mkString(",")}) follow; time-range columns partition; " +
        "2+ range dimensions suggest z-order")
  }

  /** sql_assistant.py:604 `get_suggested_queries` — deterministic
    * template instantiation over the registered schemas (the business
    * value is the schema awareness, not the prose). */
  def suggestedQueries(tables: Seq[String] = Seq.empty): Seq[(String, String)] = {
    val names = if (tables.nonEmpty) tables.map(_.toLowerCase) else schemas.keys.toSeq
    names.flatMap(schemas.get).flatMap { ts =>
      val base = Seq(
        s"SELECT count(*) AS n FROM ${ts.name}" -> s"row count of ${ts.name}")
      val groupable = ts.columns.collectFirst {
        case (n, t) if t.toLowerCase.contains("string") => n }
      val measurable = ts.columns.collectFirst {
        case (n, t) if Seq("int", "long", "double", "decimal", "bigint", "float")
          .exists(t.toLowerCase.contains) => n }
      val timeish = ts.columns.collectFirst {
        case (n, t) if Seq("date", "timestamp").exists(t.toLowerCase.contains) => n }
      base ++
        (for (g <- groupable; m <- measurable) yield
          s"SELECT $g, sum($m) AS total FROM ${ts.name} GROUP BY $g ORDER BY total DESC LIMIT 10" ->
            s"top $g by total $m") ++
        (for (t <- timeish; m <- measurable) yield
          s"SELECT date_trunc('day', $t) AS day, sum($m) AS total FROM ${ts.name} GROUP BY 1 ORDER BY 1" ->
            s"daily trend of $m")
    }
  }

  /** sql_assistant.py:650 `autocomplete` — prefix match over the
    * deterministic suggestion set (< 3 chars returns nothing, same
    * guard as the reference). */
  def autocomplete(partial: String, limit: Int = 3): Seq[String] = {
    if (partial.trim.length < 3) return Seq.empty
    val p = partial.trim.toLowerCase
    (suggestedQueries().map(_._2) ++ schemas.keys)
      .filter(_.toLowerCase.contains(p)).distinct.take(limit)
  }
}
