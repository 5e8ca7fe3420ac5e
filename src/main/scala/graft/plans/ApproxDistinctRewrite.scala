package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{CreateStruct, Expression, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in Catalyst optimizer rule: rewrite every exact
  * `count(DISTINCT …)` to a HyperLogLog++ sketch when
  * `spark.graft.approxCountDistinct=true`.
  *
  * Why a RULE and not a code change: the exact/approx choice is an
  * operational decision (oracle parity vs 100 TB cost), and the exact
  * plan's price is structural — ≥2 distinct aggregates make Catalyst
  * plan an Expand that replicates the scan per distinct group (the
  * q40-vs-q40a gap). A session-level toggle flips EVERY profile/
  * quality query in a deployment to the sketch path with zero code
  * edits, exactly like Spark's own AQE flags. The rule runs inside the
  * operator-optimization batch (via
  * [[GraftExtensions]] → `injectOptimizerRule`), BEFORE
  * `RewriteDistinctAggregates` — so the Expand is never planned at
  * all, rather than patched after the fact.
  *
  * Semantics preserved where it matters: the rewritten
  * `AggregateExpression` keeps its `resultId` and enclosing alias
  * (downstream references stay valid, output schema unchanged —
  * both Count and HLL++ return Long), keeps any FILTER clause, and a
  * multi-column distinct wraps its children in a null-guarded struct
  * (count(DISTINCT a, b) ignores rows with ANY null child; a bare
  * struct would mask that).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approxCountDistinct"
  val RsdFlag = "spark.graft.approxCountDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdFlag, "0.05").toDouble
      plan.transform {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.nonEmpty =>
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(distinctChild(c.children), rsd),
                isDistinct = false)
          }
      }
    }

  /** One HLL input expression matching count-distinct null semantics:
    * a single child passes through (HLL skips nulls like Count); a
    * multi-child tuple nulls out when ANY child is null. */
  private def distinctChild(children: Seq[Expression]): Expression =
    children match {
      case Seq(one) => one
      case many =>
        val tuple = CreateStruct(many)
        If(many.map(IsNull).reduce(Or), Literal.create(null, tuple.dataType), tuple)
    }
}

/** Session-extensions entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
}
