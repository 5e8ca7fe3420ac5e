package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large joins on hot keys.
  *
  * AQE's skew-join split handles sort-merge skew after the fact;
  * salting prevents it structurally when a handful of keys dominate
  * (the classic "one user is 30% of events" shape): the skewed side
  * spreads each key over `salts` sub-keys, the other side replicates
  * ×`salts`, and the join runs on (keys, salt) — hot partitions shrink
  * by the salt factor at the cost of replicating the smaller side.
  * Map-side partial aggregation already absorbs hot keys in
  * aggregations, so salting is only for joins (and ranked windows).
  */
object Skew {

  /** Equivalent to `skewed.join(other, keys, how)` for `inner` and
    * `left` joins (an unmatched `other` row would surface once per
    * salt under right/full outer — rejected).
    *
    * The salt is a deterministic hash of the whole skewed row, so
    * results are reproducible run-to-run and reorder-stable. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salts: Int,
      how: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(how),
      s"saltedJoin supports inner/left joins only, got '$how'")
    require(!skewed.columns.contains("_salt") && !other.columns.contains("_salt"),
      "inputs already have a _salt column; rename it before saltedJoin()")
    val sl = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salts.toLong)))
    val so = other.withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    sl.join(so, keys :+ "_salt", how).drop("_salt")
  }
}
