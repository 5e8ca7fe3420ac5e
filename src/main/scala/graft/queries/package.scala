package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query definitions. */
package object queries {

  /** ULP-stable average for 2-decimal data: `round(sum(c),2) / count(c)`.
    *
    * `round(avg(c), k)` is fragile across engines: the true average of
    * 2-decimal values is a short rational (e.g. x.70375) that can sit
    * exactly on a rounding boundary, where a 1-ULP summation-order
    * difference flips the rounded digit. `round(sum,2)` is safe (the true
    * sum has only 2 decimals, far from any 3rd-decimal boundary), and
    * dividing two bit-identical values is bit-identical. The DuckDB
    * oracle must use the same `round(sum(c),2)/count(c)` formulation.
    */
  def avgStable(c: Column): Column = round(sum(c), 2) / count(c)
}
