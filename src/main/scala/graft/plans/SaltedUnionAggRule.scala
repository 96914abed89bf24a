package graft.plans

import graft.functions.GeoAggregates.{StIntersectionAgg, StUnionAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Two-level salted rewrite for expensive geometric aggregates over
 * low-cardinality groups (the reference funnels its GEOS cascade through one
 * thread per group, geos/functions/aggregate.cpp:106-172; Spark's equivalent
 * failure mode is G reducers doing all the merging when GROUP BY has G
 * distinct values).
 *
 *   Aggregate[flag](st_union_agg(g))
 *     ⇒ Aggregate[flag](st_union_agg(__p))
 *          ← Aggregate[flag, hash(g) % S](st_union_agg(g) AS __p)
 *
 * The inner level spreads the unions over S× more reducers; the outer level
 * merges only S pre-unioned partials per group. Union and intersection are
 * associative and commutative, so the regrouping is semantics-preserving
 * (null groups stay null: the aggregates skip null partials on merge).
 *
 * Tuning: spark.graft.unionAgg.salt (default 8; ≤1 disables). Only fires
 * when every aggregate in the node is st_union_agg / st_intersection_agg
 * and grouping keys are plain attributes.
 */
class SaltedUnionAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def salt: Int =
    try spark.conf.get("spark.graft.unionAgg.salt", "8").toInt catch { case _: NumberFormatException => 0 }

  private val SaltName = "__graft_union_salt"
  private val PartialName = "__graft_union_partial"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val s = salt
    if (s <= 1) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if agg.resolved && groupExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[Attribute]) &&
            // don't re-fire on our own output: the outer level reads
            // __graft_union_partial columns, the inner level groups by the
            // salt key
            !aggExprs.exists(_.exists {
              case a: Attribute => a.name.startsWith(PartialName)
              case _ => false
            }) &&
            !groupExprs.exists {
              case a: Attribute => a.name == SaltName
              case _ => false
            } &&
            eligible(aggExprs) =>
        rewrite(agg, groupExprs.map(_.asInstanceOf[Attribute]), aggExprs, child, s)
    }
  }

  /** every aggregate function must be an associative geometric one, plain
   *  (no DISTINCT / FILTER), and there must be at least one */
  private def eligible(aggExprs: Seq[NamedExpression]): Boolean = {
    val aggs = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    aggs.nonEmpty && aggs.forall { ae =>
      !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction.isInstanceOf[StUnionAgg] ||
          ae.aggregateFunction.isInstanceOf[StIntersectionAgg])
    }
  }

  private def rewrite(agg: Aggregate, groupAttrs: Seq[Attribute],
                      aggExprs: Seq[NamedExpression], child: LogicalPlan, s: Int): LogicalPlan = {
    // one inner partial per distinct aggregate function call
    val calls = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae }).distinct
    val partials = calls.zipWithIndex.map { case (ae, i) =>
      ae -> Alias(ae, s"$PartialName$i")()
    }
    val firstChild = calls.head.aggregateFunction.children.head
    val saltExpr = Alias(Pmod(new Murmur3Hash(Seq(firstChild)), Literal(s)), SaltName)()
    val inner = Aggregate(
      groupAttrs :+ saltExpr.toAttribute,
      (groupAttrs: Seq[NamedExpression]) ++ partials.map(_._2),
      Project(child.output :+ saltExpr, child))

    val partialAttr: Map[AggregateExpression, Attribute] =
      partials.map { case (ae, al) => ae -> al.toAttribute }.toMap
    val outerAggExprs = aggExprs.map { ne =>
      ne.transform {
        case ae: AggregateExpression =>
          val attr = partialAttr(ae)
          val refed = ae.aggregateFunction match {
            case u: StUnionAgg => u.copy(child = attr)
            case ix: StIntersectionAgg => ix.copy(child = attr)
          }
          AggregateExpression(refed, Complete, isDistinct = false)
      }.asInstanceOf[NamedExpression]
    }
    Aggregate(groupAttrs, outerAggExprs, inner)
  }
}
