package graft.plans

import graft.functions.FnExpr
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Measure fusion: `st_area(st_intersection(a, b))` (and union/difference)
 * rewrites to a fused area function that never materializes the overlay
 * geometry — rect×rect intersections reduce to pure arithmetic and
 * union/difference areas follow by inclusion-exclusion. The classic
 * avoid-the-intermediate optimizer move; the reference evaluates the overlay
 * then measures it (st_area.cpp over the st_intersection result vector).
 *
 * Disable with spark.graft.measureFusion.enabled=false for bit-identical
 * parity with the unfused two-step evaluation on non-integer coordinates
 * (inclusion-exclusion can differ from the traced polygon's shoelace in the
 * last ulp there).
 */
class MeasureFusionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val fused = Map(
    "st_intersection" -> "st_intersection_area",
    "st_union" -> "st_union_area",
    "st_difference" -> "st_difference_area")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.measureFusion.enabled", "true").toBoolean) return plan
    plan.transformAllExpressions {
      case FnExpr("st_area", Seq(FnExpr(op, args)))
          if args.length == 2 && fused.contains(op) =>
        FnExpr(fused(op), args)
      // aggregate fusion: st_area(st_union_agg(g)) → a sweep-line
      // area-of-rect-union aggregate (deduped rect state, JTS fallback for
      // non-rect inputs); st_area(st_intersection_agg(g)) → a running rect
      // intersection (8 doubles of state). Neither materializes the overlay.
      case FnExpr("st_area",
          Seq(ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            u: graft.functions.GeoAggregates.StUnionAgg, _, _, _, _))) =>
        ae.copy(aggregateFunction = graft.functions.GeoAggregates.StUnionAreaAgg(u.child))
      case FnExpr("st_area",
          Seq(ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            ix: graft.functions.GeoAggregates.StIntersectionAgg, _, _, _, _))) =>
        ae.copy(aggregateFunction = graft.functions.GeoAggregates.StIntersectionAreaAgg(ix.child))
    }
  }
}
