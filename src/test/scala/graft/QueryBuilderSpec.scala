package graft

import graft.llm.QueryBuilder
import graft.llm.QueryBuilder.{IndexSuggestion, TableSchema}

/** Deterministic NL→SQL core: schema registry, guardrail validation,
  * explain / optimize / suggest-indexes (ref llm/query_builder.py,
  * llm/sql_assistant.py:548 `_security_check`). */
class QueryBuilderSpec extends SparkSpec {

  import spark.implicits._

  private def builder: QueryBuilder = {
    val qb = new QueryBuilder()
    qb.registerTable(TableSchema(
      "orders",
      Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_totalprice" -> "double", "o_orderdate" -> "date",
        "o_orderstatus" -> "string"),
      description = "orders fact",
      partitionColumns = Seq("o_orderdate")))
    qb.registerTable(TableSchema(
      "customer",
      Seq("c_custkey" -> "bigint", "c_name" -> "string", "c_acctbal" -> "double")))
    qb.registerTable(TableSchema(
      "raw_events", Seq("payload" -> "string"), tier = "restricted"))
    qb
  }

  test("registerDataFrame captures the Spark schema without touching data") {
    val qb = new QueryBuilder()
    qb.registerDataFrame("t", Seq((1L, "a")).toDF("id", "name"))
    assert(qb.registeredTables == Seq("t"))
    // the registered schema drives SELECT * expansion
    val opt = qb.optimizeQuery("SELECT * FROM t")
    assert(opt.optimizedSql == "SELECT id, name FROM t")
  }

  test("valid query passes; dangerous ops and injection shapes are unsafe") {
    val qb = builder
    val ok = qb.validateQuery(
      "SELECT o_orderstatus, count(*) AS n FROM orders WHERE o_orderdate >= DATE '1995-01-01' GROUP BY o_orderstatus")
    assert(ok.isValid && ok.isSafe && ok.securityIssues.isEmpty)

    val drop = qb.validateQuery("DROP TABLE orders")
    assert(!drop.isSafe && drop.securityIssues.exists(_.contains("drop")))

    val inject = qb.validateQuery("SELECT * FROM orders WHERE o_orderstatus = '' OR ''=''; -- x")
    assert(!inject.isSafe)

    // dangerous keywords INSIDE string literals are data, not statements
    val literal = qb.validateQuery("SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'drop'")
    assert(literal.isSafe)
  }

  test("semantic issues: unknown tables and tier gating") {
    val qb = builder
    val unknown = qb.validateQuery("SELECT count(*) AS n FROM nope")
    assert(!unknown.isValid && unknown.semanticIssues == Seq("unknown table: nope"))

    val gated = qb.validateQuery("SELECT count(*) AS n FROM raw_events")
    assert(!gated.isSafe && gated.securityIssues.exists(_.contains("restricted")))
  }

  test("syntax issues: non-select, unbalanced parens, unterminated literal") {
    val qb = builder
    assert(!qb.validateQuery("").isValid)
    assert(qb.validateQuery("SELECT count( FROM orders").syntaxIssues
      .contains("unbalanced parentheses"))
    assert(qb.validateQuery("SELECT * FROM orders WHERE o_orderstatus = 'oops")
      .syntaxIssues.contains("unterminated string literal"))
  }

  test("performance issues: SELECT *, unbounded scan, wildcard LIKE, comma join, partition filter") {
    val qb = builder
    val v = qb.validateQuery("SELECT * FROM orders, customer WHERE o_orderstatus LIKE '%x'")
    val all = v.performanceIssues.mkString("; ")
    assert(all.contains("SELECT *"))
    assert(all.contains("comma join"))
    assert(all.contains("leading-wildcard"))
    assert(all.contains("partition columns"))
    // a partition-pruned aggregate raises none of them
    val clean = qb.validateQuery(
      "SELECT count(*) AS n FROM orders WHERE o_orderdate = DATE '1995-01-01'")
    assert(clean.performanceIssues.isEmpty)
  }

  test("buildQuery routes the generation seam through the guardrails") {
    val qb = builder
    val r = qb.buildQuery("how many orders by o_orderstatus", Seq("orders"))
    assert(r.sql == "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus")
    assert(r.isValid && r.isSafe)
    assert(r.tablesUsed == Seq("orders"))
    assert(r.complexity == "medium")
    assert(r.explanation.contains("Groups rows by"))
  }

  test("buildQuery on an unregistered table fails with the registry error shape") {
    val qb = builder
    val e = intercept[IllegalArgumentException](qb.buildQuery("count rows", Seq("nope")))
    assert(e.getMessage.contains("Unknown table 'nope'"))
    assert(e.getMessage.contains("orders") && e.getMessage.contains("customer"))
    val empty = new QueryBuilder()
    assert(intercept[IllegalArgumentException](
      empty.buildQuery("count rows", Seq("nope"))).getMessage.contains("(none)"))
  }

  test("explainQuery renders the clause structure step by step") {
    val qb = builder
    val e = qb.explainQuery(
      "SELECT o_orderstatus, sum(o_totalprice) AS total FROM orders " +
        "WHERE o_orderdate >= DATE '1995-01-01' GROUP BY o_orderstatus " +
        "ORDER BY total DESC LIMIT 10")
    assert(e.contains("Reads from orders"))
    assert(e.contains("Keeps rows where"))
    assert(e.contains("Groups rows by o_orderstatus"))
    assert(e.contains("Sorts the result by total desc".toLowerCase) ||
      e.toLowerCase.contains("sorts the result by total desc"))
    assert(e.contains("Returns at most 10 rows"))
  }

  test("complexity: scan < aggregate < join/subquery/window") {
    val qb = builder
    assert(qb.complexity("SELECT o_orderkey FROM orders LIMIT 5") == "low")
    assert(qb.complexity("SELECT o_orderstatus, count(*) FROM orders GROUP BY 1") == "medium")
    assert(qb.complexity(
      "SELECT c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN customer c2 ON c2.c_custkey = o_custkey") == "high")
    assert(qb.complexity(
      "SELECT o_orderkey, row_number() OVER (ORDER BY o_totalprice) FROM orders") == "high")
  }

  test("optimizeQuery expands SELECT * only when provably safe") {
    val qb = builder
    val single = qb.optimizeQuery("SELECT * FROM orders LIMIT 10")
    assert(single.optimizedSql.startsWith(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderstatus FROM"))
    assert(single.changesMade.nonEmpty)
    // multi-table FROM: no safe expansion, recorded as a warning
    val multi = qb.optimizeQuery("SELECT * FROM orders JOIN customer ON o_custkey = c_custkey")
    assert(multi.optimizedSql.contains("*") && multi.changesMade.isEmpty)
    assert(multi.warnings.exists(_.contains("cannot expand safely")))
  }

  test("suggestIndexes derives sort/partition/z-order from the predicate structure") {
    val qb = builder
    val s: IndexSuggestion = qb.suggestIndexes(
      "SELECT o_orderstatus, sum(o_totalprice) FROM orders " +
        "WHERE o_orderstatus = 'F' AND o_orderdate >= DATE '1995-01-01' " +
        "AND o_totalprice < 1000 GROUP BY o_orderstatus",
      "orders")
    // equality first, then range, then group-by
    assert(s.sortColumns.head == "o_orderstatus")
    assert(s.sortColumns.contains("o_orderdate") && s.sortColumns.contains("o_totalprice"))
    assert(s.partitionColumns.contains("o_orderdate")) // time-range column partitions
    assert(s.zOrderColumns.toSet == Set("o_orderdate", "o_totalprice")) // 2 range dims
    intercept[IllegalArgumentException](qb.suggestIndexes("SELECT 1", "nope"))
  }

  test("suggestedQueries and autocomplete instantiate deterministic templates") {
    val qb = builder
    val sugg = qb.suggestedQueries(Seq("orders"))
    assert(sugg.exists(_._1 == "SELECT count(*) AS n FROM orders"))
    assert(sugg.exists(_._2.startsWith("top o_orderstatus by total")))
    assert(sugg.exists(_._2.startsWith("daily trend")))
    // every suggested query passes the builder's own guardrails
    sugg.foreach { case (sql, _) =>
      val v = qb.validateQuery(sql); assert(v.isValid && v.isSafe, sql) }
    assert(qb.autocomplete("da").isEmpty) // < 3 chars
    assert(qb.autocomplete("daily").nonEmpty)
  }
}
