package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.medallion.Gold
import graft.medallion.Gold._

/** Gold-layer queries (q01–q07) + DuckDB oracles.
  *
  * Float-valued aggregates are rounded identically on both sides (sums
  * → 2 dp, ratios → 4 dp) to absorb summation-order ULP differences
  * between engines; every computed column carries the same alias in
  * Spark and SQL because the driver's hash compare sorts by column name.
  */
object GoldQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q01_gold_agg" -> ((s, d) =>
      Gold.aggregate(
        Tables.lineitem(s, d),
        groupBy = Seq("l_returnflag", "l_linestatus"),
        aggs = Seq(
          Expr(round(sum(col("l_quantity")), 2), "sum_qty"),
          Expr(round(sum(col("l_extendedprice")), 2), "sum_base_price"),
          Expr(avgStable(col("l_quantity")), "avg_qty"),
          Expr(avgStable(col("l_discount")), "avg_disc"),
          CountAll("count_order")),
        filter = Some(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")))),

    "q02_gold_denorm" -> ((s, d) =>
      Gold.denormalize(
        Tables.orders(s, d),
        Seq(
          // customer is sf-proportional (~15M rows at sf100) — no hard
          // broadcast hint; Spark's size-based auto-broadcast / AQE
          // decides. nation (25) and region (5) are true bounded dims.
          JoinDef(Tables.customer(s, d), Seq("o_custkey"), Seq("c_custkey"), "inner"),
          JoinDef(Tables.nation(s, d), Seq("c_nationkey"), Seq("n_nationkey"), "inner", broadcastRight = true),
          JoinDef(Tables.region(s, d), Seq("n_regionkey"), Seq("r_regionkey"), "inner", broadcastRight = true)),
        select = Seq(
          col("o_orderkey"), round(col("o_totalprice"), 2).as("total_price"),
          col("c_name"), col("n_name"), col("r_name")))
        .filter(col("r_name") === "ASIA")),

    "q03_gold_metrics_time" -> ((s, d) =>
      Gold.metrics(
        Tables.events(s, d),
        metricExprs = Seq(
          CountAll("n_events"),
          Expr(round(sum(col("value")), 2), "sum_value"),
          Expr(avgStable(col("value")), "avg_value")),
        dimensions = Seq("event_type"),
        timeColumn = Some("ts"),
        timeGranularity = "day")),

    "q04_gold_having" -> ((s, d) =>
      Gold.aggregate(
        Tables.orders(s, d),
        groupBy = Seq("o_custkey"),
        aggs = Seq(
          CountAll("n_orders"),
          Expr(round(sum(col("o_totalprice")), 2), "total_spend")),
        having = Some(col("n_orders") >= 8))),

    "q05_gold_topk_window" -> ((s, d) =>
      Gold.topKPerGroup(
        Tables.orders(s, d),
        partitionBy = Seq("o_custkey"),
        orderBy = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total_price"),
          col("rn").cast("long").as("rn"))),

    "q06_gold_feature_table" -> ((s, d) =>
      Gold.featureTable(
        Tables.customer(s, d), "c_custkey",
        Tables.orders(s, d), "o_custkey",
        features = Seq(
          CountAll("num_orders"),
          Expr(round(sum(col("o_totalprice")), 2), "total_spend"),
          Expr(avgStable(col("o_totalprice")), "avg_spend"),
          Expr(round(max(col("o_totalprice")), 2), "max_order"),
          Expr(min(col("o_orderdate")), "first_order_date"),
          Expr(max(col("o_orderdate")), "last_order_date")),
        fillZero = Seq("num_orders"))
        .select(
          col("c_custkey"), col("c_mktsegment"), col("num_orders"),
          col("total_spend"), col("avg_spend"), col("max_order"),
          col("first_order_date"), col("last_order_date"))),

    "q07_gold_agg_collect" -> ((s, d) =>
      Gold.aggregate(
        Tables.lineitem(s, d),
        groupBy = Seq("l_orderkey"),
        aggs = Seq(
          // l_linenumber is NOT unique within an order in this data, so
          // the order key folds in the value (scaled to an exact integer
          // — quantities have ≤2 decimals) as a tiebreaker; ties then
          // select equal values, keeping FIRST/LAST deterministic. The
          // 1e6 multiplier keeps line-number strata disjoint for any
          // quantity < 10000.
          Expr(min_by(col("l_quantity"),
            col("l_linenumber").cast("long") * 1000000 + round(col("l_quantity") * 100).cast("long")), "first_qty"),
          Expr(max_by(col("l_quantity"),
            col("l_linenumber").cast("long") * 1000000 + round(col("l_quantity") * 100).cast("long")), "last_qty"),
          Collect("l_linenumber", "line_numbers")))))

  val oracles: Map[String, String] = Map(
    "q01_gold_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_quantity),2)/count(l_quantity) AS avg_qty,
         round(sum(l_discount),2)/count(l_discount) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_gold_denorm" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS total_price,
         c_name, n_name, r_name
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'""",

    "q03_gold_metrics_time" ->
      """SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS _time_period,
         count(*) AS n_events,
         round(sum(value),2) AS sum_value,
         round(sum(value),2)/count(value) AS avg_value
         FROM events GROUP BY event_type, date_trunc('day', ts)""",

    "q04_gold_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice),2) AS total_spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 8""",

    "q05_gold_topk_window" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS total_price, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) WHERE rn <= 3""",

    "q06_gold_feature_table" ->
      """SELECT c_custkey, c_mktsegment,
         coalesce(num_orders, 0) AS num_orders,
         total_spend, avg_spend, max_order, first_order_date, last_order_date
         FROM customer LEFT JOIN (
           SELECT o_custkey, count(*) AS num_orders,
                  round(sum(o_totalprice),2) AS total_spend,
                  round(sum(o_totalprice),2)/count(o_totalprice) AS avg_spend,
                  round(max(o_totalprice),2) AS max_order,
                  min(o_orderdate) AS first_order_date,
                  max(o_orderdate) AS last_order_date
           FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey""",

    "q07_gold_agg_collect" ->
      """SELECT l_orderkey,
         min_by(l_quantity, l_linenumber*1000000 + CAST(round(l_quantity*100) AS BIGINT)) AS first_qty,
         max_by(l_quantity, l_linenumber*1000000 + CAST(round(l_quantity*100) AS BIGINT)) AS last_qty,
         string_agg(CAST(l_linenumber AS VARCHAR), ','
                    ORDER BY CAST(l_linenumber AS VARCHAR)) AS line_numbers
         FROM lineitem GROUP BY l_orderkey""")
}
