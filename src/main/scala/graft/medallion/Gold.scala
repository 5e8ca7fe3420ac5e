package graft.medallion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer business aggregation operators.
  *
  * Re-expresses the reference's gold layer
  * (automic_etl/medallion/gold.py:20-491) Spark-first: every method
  * returns a declarative plan so Catalyst applies partial (map-side)
  * aggregation, broadcast joins on dimensions, and pushdown. Nothing here
  * collects to the driver.
  */
object Gold {

  /** Aggregation types from gold.py:20 `AggregationType`.
    *
    * FIRST/LAST in the reference are order-dependent (Polars row order);
    * a distributed engine has no implicit row order, so they take an
    * explicit key column and become min_by/max_by — deterministic under
    * any partitioning, which is the only semantics that survives a
    * 1000-executor cluster.
    */
  sealed trait AggSpec { def output: String; def expr: Column }
  final case class Sum(source: String, output: String) extends AggSpec { def expr: Column = sum(col(source)).as(output) }
  final case class Count(source: String, output: String) extends AggSpec { def expr: Column = count(col(source)).as(output) }
  final case class CountAll(output: String) extends AggSpec { def expr: Column = count(lit(1)).as(output) }
  final case class Avg(source: String, output: String) extends AggSpec { def expr: Column = avg(col(source)).as(output) }
  final case class Min(source: String, output: String) extends AggSpec { def expr: Column = min(col(source)).as(output) }
  final case class Max(source: String, output: String) extends AggSpec { def expr: Column = max(col(source)).as(output) }
  /** Value of `source` on the row minimizing `orderKey` (reference FIRST). */
  final case class First(source: String, orderKey: String, output: String) extends AggSpec {
    def expr: Column = min_by(col(source), col(orderKey)).as(output)
  }
  /** Value of `source` on the row maximizing `orderKey` (reference LAST). */
  final case class Last(source: String, orderKey: String, output: String) extends AggSpec {
    def expr: Column = max_by(col(source), col(orderKey)).as(output)
  }
  /** Sorted collected list (reference COLLECT / implode), rendered as a
    * canonical joined string so results are order-independent.
    */
  final case class Collect(source: String, output: String, sep: String = ",") extends AggSpec {
    def expr: Column = array_join(sort_array(collect_list(col(source).cast("string"))), sep).as(output)
  }
  final case class Expr(column: Column, output: String) extends AggSpec { def expr: Column = column.as(output) }

  /** gold.py:62 `aggregate`: filter → group-by → aggs → having. */
  def aggregate(
      df: DataFrame,
      groupBy: Seq[String],
      aggs: Seq[AggSpec],
      filter: Option[Column] = None,
      having: Option[Column] = None): DataFrame = {
    require(aggs.nonEmpty, "aggregate needs at least one AggSpec")
    val filtered = filter.map(df.filter).getOrElse(df)
    val exprs = aggs.map(_.expr)
    val grouped =
      if (groupBy.isEmpty) filtered.agg(exprs.head, exprs.tail: _*)
      else filtered.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
    having.map(grouped.filter).getOrElse(grouped)
  }

  /** gold.py:439 `JoinDefinition`. `broadcastRight` marks TRUE dimension
    * tables (bounded size regardless of data scale — e.g. nation/region);
    * for these the fact side never shuffles. The default is `false`:
    * Spark's size-based auto-broadcast (plus AQE) then decides at
    * runtime, which is the only safe default for tables that grow with
    * the data — a hard `broadcast()` hint on an sf-proportional table
    * (e.g. customer) OOMs the driver and every executor at 100 TB.
    */
  final case class JoinDef(
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      how: String = "left",
      broadcastRight: Boolean = false)

  /** gold.py:176 `create_denormalized_view`: chained joins off a base fact. */
  def denormalize(base: DataFrame, joins: Seq[JoinDef], select: Seq[Column] = Nil): DataFrame = {
    val joined = joins.foldLeft(base) { (acc, j) =>
      val r = if (j.broadcastRight) broadcast(j.right) else j.right
      val cond = j.leftOn.zip(j.rightOn).map { case (l, rc) => acc(l) === r(rc) }.reduce(_ && _)
      acc.join(r, cond, j.how)
    }
    if (select.isEmpty) joined else joined.select(select: _*)
  }

  /** gold.py:315 time truncation granularities. */
  def truncateTime(c: Column, granularity: String): Column = granularity match {
    case "hour" | "day" | "week" | "month" | "year" => date_trunc(granularity, c)
    case _ => date_trunc("day", c)
  }

  /** gold.py:225 `compute_metrics`: dimensional + time-bucketed metrics. */
  def metrics(
      df: DataFrame,
      metricExprs: Seq[AggSpec],
      dimensions: Seq[String] = Nil,
      timeColumn: Option[String] = None,
      timeGranularity: String = "day"): DataFrame = {
    val (withTime, groupCols) = timeColumn match {
      case Some(tc) =>
        require(!df.columns.contains("_time_period"),
          "input already has a _time_period column; rename it before metrics()")
        (df.withColumn("_time_period", truncateTime(col(tc), timeGranularity)),
          dimensions :+ "_time_period")
      case None => (df, dimensions)
    }
    aggregate(withTime, groupCols, metricExprs)
  }

  /** gold.py:115 `create_feature_table`: per-entity features from a fact
    * table, joined back onto the entity dimension. The fact aggregates
    * first (shuffle on entity key, partial agg applies), then joins the
    * much smaller per-entity result — at scale this is agg-then-join,
    * never join-then-agg.
    */
  def featureTable(
      entities: DataFrame,
      entityKey: String,
      fact: DataFrame,
      factKey: String,
      features: Seq[AggSpec],
      fillZero: Seq[String] = Nil): DataFrame = {
    val aggd = aggregate(fact, Seq(factKey), features)
    val joined = entities.join(aggd, entities(entityKey) === aggd(factKey), "left").drop(factKey)
    fillZero.foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(0))))
  }

  /** Trailing time-window rolling metrics: for each row, aggregates
    * over the same key's rows in [ts − window, ts]. A RANGE frame over
    * epoch-micros — one shuffle on the key, one in-partition sort,
    * frame evaluation is linear per partition. */
  def rollingMetrics(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMs: Long,
      aggs: Seq[(Column, String)]): DataFrame = {
    require(aggs.nonEmpty, "rollingMetrics needs at least one aggregate")
    val w = Window.partitionBy(keyCol)
      .orderBy(graft.ops.TimeOps.epochMicros(col(tsCol)))
      .rangeBetween(-windowMs * 1000L, 0L)
    aggs.foldLeft(df) { case (d, (agg, name)) => d.withColumn(name, agg.over(w)) }
  }

  /** Pivoted metrics without Spark's `pivot()` (which either runs an
    * extra distinct-values job or trusts caller-supplied values anyway):
    * one hash aggregation with a conditional aggregate per (value,
    * metric) cell. Fixed, caller-controlled output schema — the only
    * shape that works at 100 TB, where a distinct scan just to name
    * columns is wasted I/O. */
  def pivotMetrics(
      df: DataFrame,
      groupBy: Seq[String],
      pivotCol: String,
      pivotValues: Seq[String],
      aggs: Seq[(String => Column, String)]): DataFrame = {
    require(pivotValues.nonEmpty && aggs.nonEmpty, "pivotMetrics needs values and aggregates")
    val exprs = for {
      v <- pivotValues
      (mk, suffix) <- aggs
    } yield mk(v).as(s"${v}_$suffix")
    df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Top-K rows per group (reporting/feature pattern). One shuffle; the
    * window sort is bounded per-partition. `orderBy` must be total
    * (include a unique tiebreaker) for deterministic results.
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
