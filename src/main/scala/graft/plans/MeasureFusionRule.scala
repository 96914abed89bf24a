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
    "st_difference" -> "st_difference_area",
    "st_symdifference" -> "st_symdifference_area")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.measureFusion.enabled", "true").toBoolean) return plan
    plan.transformAllExpressions {
      case FnExpr("st_area", Seq(FnExpr(op, args)))
          if args.length == 2 && fused.contains(op) =>
        FnExpr(fused(op), args)
      // the symmetric difference is empty exactly when the two point sets
      // are equal — st_equals has prepared/rectangle fast paths, so the
      // overlay geometry is never built just to test emptiness. The
      // empty∆empty case needs its own disjunct: relate-based equals is
      // false on two empties while their symdifference IS empty.
      // determinism guard: the rewrite duplicates each argument (isempty
      // disjunct + st_equals), so a non-deterministic arg would be evaluated
      // twice with different values
      case FnExpr("st_isempty", Seq(FnExpr("st_symdifference", args)))
          if args.length == 2 && args.forall(_.deterministic) =>
        org.apache.spark.sql.catalyst.expressions.Or(
          org.apache.spark.sql.catalyst.expressions.And(
            FnExpr("st_isempty", Seq(args(0))), FnExpr("st_isempty", Seq(args(1)))),
          FnExpr("st_equals", args))
      // st_area(st_buffer(…)) → fused area: skips the buffered polygon's
      // WKB write + re-parse, and the fused function's memo probe precedes
      // the input parse entirely (the q_buffer_styles hot path)
      case FnExpr("st_area", Seq(FnExpr("st_buffer", args)))
          if args.length == 2 || args.length == 3 || args.length == 6 =>
        FnExpr("st_buffer_area", args)
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
      // Count fusion over st_collect_agg: the collect aggregate buffers every
      // geometry per group (unbounded state — fine when the user wants the
      // collection, an OOM when they only want a count). st_ngeometries of
      // the collected result = number of non-null non-empty inputs (StCollectAgg
      // skips both), so rewrite to a plain codegen'd count; st_npoints of the
      // result = sum of member point counts, so rewrite to sum. Zero-input
      // groups collect to an empty GEOMETRYCOLLECTION → both measures are 0.
      // DISTINCT guard: st_ngeometries(st_collect_agg(DISTINCT g)) must count
      // distinct geometries, but the rewritten Count(DISTINCT <1/null>) would
      // always return 1 (and SUM(DISTINCT npoints) drops duplicate counts) —
      // leave DISTINCT aggregates un-fused. Union/intersection area fusion
      // above is DISTINCT-safe (both overlays are idempotent).
      case FnExpr(ng,
          Seq(ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            c: graft.functions.GeoAggregates.StCollectAgg, _, _, _, _)))
          if (ng == "st_ngeometries" || ng == "st_numgeometries") && !ae.isDistinct =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, If, Literal}
        import org.apache.spark.sql.types.IntegerType
        val counted = If(
          Coalesce(Seq(FnExpr("st_isempty", Seq(c.child)), Literal(true))),
          Literal(null, IntegerType), Literal(1))
        Cast(ae.copy(aggregateFunction =
          org.apache.spark.sql.catalyst.expressions.aggregate.Count(Seq(counted))), IntegerType)
      case FnExpr(np,
          Seq(ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            c: graft.functions.GeoAggregates.StCollectAgg, _, _, _, _)))
          if (np == "st_npoints" || np == "st_numpoints") && !ae.isDistinct =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Literal}
        import org.apache.spark.sql.types.IntegerType
        Cast(Coalesce(Seq(
          ae.copy(aggregateFunction =
            org.apache.spark.sql.catalyst.expressions.aggregate.Sum(FnExpr("st_npoints", Seq(c.child)))),
          Literal(0L))), IntegerType)
    }
  }
}
