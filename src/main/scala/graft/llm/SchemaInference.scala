package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic parts of the reference's LLM augmentation surface
  * (ref llm/schema_generator.py). The LLM-backed pieces (free-text
  * schema descriptions, NL→SQL) are external-service calls out of
  * deterministic scope; what IS deterministic — type inference from
  * observed data, DDL rendering, rename suggestions — is implemented
  * for real, and the NL→SQL entry point is a trait with a rule-based
  * default so callers can plug a real model without code changes.
  */
object SchemaInference {

  /** Infer a column type from observed string data in ONE aggregate
    * pass over all candidate columns: a column is BIGINT if every
    * non-null value matches the integer pattern, DOUBLE if numeric,
    * BOOLEAN / DATE / TIMESTAMP likewise, else STRING.
    * → (column, inferred_type, n_nonnull, n_matching) */
  def inferTypes(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "inferTypes needs at least one column")
    val patterns = Seq(
      "BIGINT"    -> "^[+-]?\\d+$",
      "DOUBLE"    -> "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$",
      "BOOLEAN"   -> "^(?i)(true|false)$",
      "DATE"      -> "^\\d{4}-\\d{2}-\\d{2}$",
      "TIMESTAMP" -> "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}")

    val aggs: Seq[Column] = columns.flatMap { c =>
      count(col(c)).as(s"_n_$c") +: patterns.map { case (t, p) =>
        count(when(regexp_like(col(c).cast("string"), lit(p)), 1)).as(s"_${t}_$c")
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows = columns.map { c =>
      val n = col(s"_n_$c")
      val inferred = patterns.foldLeft(when(n === 0, "STRING")) { case (acc, (t, _)) =>
        acc.when(col(s"_${t}_$c") === n, t)
      }.otherwise("STRING")
      val matched = patterns.foldLeft(when(lit(false), lit(0L))) { case (acc, (t, _)) =>
        acc.when(col(s"_${t}_$c") === n, col(s"_${t}_$c"))
      }.otherwise(lit(0L))
      struct(lit(c).as("column"), inferred.as("inferred_type"),
        n.cast("long").as("n_nonnull"), matched.cast("long").as("n_matching"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** schema_generator.py:174 `generate_table_ddl` (rendering only). */
  def renderDdl(table: String, columns: Seq[(String, String)], partitionBy: Seq[String] = Nil): String = {
    val cols = columns.map { case (n, t) => s"  $n $t" }.mkString(",\n")
    val part = if (partitionBy.isEmpty) "" else s"\nPARTITIONED BY (${partitionBy.mkString(", ")})"
    s"CREATE TABLE $table (\n$cols\n)$part"
  }

  /** schema_generator.py:215 `suggest_column_renames` — deterministic
    * snake_case suggestions (only columns that actually change). */
  def suggestRenames(columns: Seq[String]): Map[String, String] =
    columns.flatMap { c =>
      var s = c
      s = s.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      s = s.replaceAll("([a-z\\d])([A-Z])", "$1_$2")
      s = s.replaceAll("[-\\s]+", "_")
      val snake = s.toLowerCase
      if (snake != c) Some(c -> snake) else None
    }.toMap
}

/** NL→SQL plumbing (ref llm/nl2sql): the interface a real LLM backend
  * implements; [[RuleBasedNl2Sql]] is the deterministic default used in
  * tests and offline environments. */
trait Nl2Sql {
  def toSql(question: String, table: String, columns: Seq[String]): String
}

/** Keyword-rule translator: "count …" → COUNT(*), "average of X" →
  * AVG(X), else SELECT *. Deliberately minimal — it exists to pin the
  * interface and give pipelines a predictable offline fallback. */
object RuleBasedNl2Sql extends Nl2Sql {
  def toSql(question: String, table: String, columns: Seq[String]): String = {
    val q = question.toLowerCase
    val byCol = columns.find(c => q.contains(s"by ${c.toLowerCase}"))
    def grouped(agg: String): String = byCol match {
      case Some(g) => s"SELECT $g, $agg FROM $table GROUP BY $g"
      case None    => s"SELECT $agg FROM $table"
    }
    val avgCol = columns.find(c => q.contains(s"average ${c.toLowerCase}") ||
      q.contains(s"average of ${c.toLowerCase}") || q.contains(s"mean ${c.toLowerCase}"))
    val sumCol = columns.find(c => q.contains(s"total ${c.toLowerCase}") ||
      q.contains(s"sum of ${c.toLowerCase}"))
    if (q.contains("how many") || q.startsWith("count")) grouped("COUNT(*) AS n")
    else if (avgCol.isDefined) grouped(s"AVG(${avgCol.get}) AS avg_${avgCol.get}")
    else if (sumCol.isDefined) grouped(s"SUM(${sumCol.get}) AS sum_${sumCol.get}")
    else s"SELECT * FROM $table"
  }
}
