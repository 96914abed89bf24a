package graft.plans

import graft.functions.FnExpr
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.locationtech.jts.index.strtree.STRtree

/**
 * Broadcast R-tree spatial join — the right plan for the dominant production
 * shape: a huge fact table of geometries joined against a small dimension
 * table (zones, regions, admin boundaries).
 *
 * The tile join (SpatialJoinRule) shuffles BOTH sides by tile id; that is the
 * scalable general plan, but when one side fits in a broadcast it pays an
 * unnecessary full shuffle of the big side. Spark's own fallback for a
 * non-equi join with one small side is BroadcastNestedLoopJoin — which
 * evaluates the predicate against EVERY build row per streamed row
 * (O(|stream| × |build|) exact-predicate calls). This operator broadcasts the
 * small side, builds a JTS STRtree over its geometry envelopes once per
 * executor, and probes it with each streamed row's envelope — candidates drop
 * from |build| to the bbox-overlapping few, then the ORIGINAL join condition
 * runs as the exact residual (so semantics are identical to the Inner join it
 * replaces, for predicates that imply bbox overlap).
 *
 * This is the (c)-tier extension path from the design brief: a custom
 * LogicalPlan + Rule + SparkStrategy + SparkPlan, registered through
 * SparkSessionExtensions. The rule runs BEFORE SpatialJoinRule in the same
 * batch: small-side joins take this plan, everything else falls through to
 * the tile rewrite.
 *
 * Reference parallel: optimizer_rules.cpp rewrites its blockwise-NL join to a
 * bbox IEJoin; on a cluster the broadcast-index probe is the equivalent
 * "avoid the quadratic pair loop" move for the small-dimension case.
 */
case class SpatialBroadcastJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    lGeom: Expression,
    rGeom: Expression,
    condition: Expression,
    buildLeft: Boolean,
    expand: Double) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): SpatialBroadcastJoin =
    copy(left = newLeft, right = newRight)
}

class BroadcastSpatialJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  // predicates whose truth implies envelope overlap (st_disjoint excluded —
  // same set SpatialJoinRule accepts, optimizer_rules.cpp:96-98)
  private val rewritable = Set(
    "st_intersects", "st_equals", "st_touches", "st_crosses", "st_within",
    "st_contains", "st_overlaps", "st_covers", "st_coveredby", "st_containsproperly")

  private def enabled: Boolean =
    spark.conf.get("spark.graft.spatialJoin.enabled", "true").toBoolean &&
      spark.conf.get("spark.graft.spatialJoin.broadcast.enabled", "true").toBoolean

  private def threshold: Long =
    spark.conf.getOption("spark.graft.spatialJoin.broadcastThreshold").map(_.toLong)
      .getOrElse(spark.sessionState.conf.autoBroadcastJoinThreshold)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || threshold <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !tiled(cond) =>
        findSpatialPredicate(cond, left, right) match {
          case Some((lGeom, rGeom, expand)) =>
            val lSize = left.stats.sizeInBytes
            val rSize = right.stats.sizeInBytes
            if (rSize <= threshold && rSize <= lSize)
              SpatialBroadcastJoin(left, right, lGeom, rGeom, cond, buildLeft = false, expand)
            else if (lSize <= threshold)
              SpatialBroadcastJoin(left, right, lGeom, rGeom, cond, buildLeft = true, expand)
            else j
          case None => j
        }
    }
  }

  private def tiled(cond: Expression): Boolean = cond.exists {
    case a: AttributeReference => a.name.startsWith("__graft_tile")
    case _ => false
  }

  /** Returns (leftSideGeom, rightSideGeom, envelopeExpansion). Plain bbox-
   *  implying predicates expand by 0; st_dwithin with a CONSTANT distance
   *  expands the probe envelope by it (dwithin(a,b,d) implies the envelopes
   *  lie within d of each other). */
  private def findSpatialPredicate(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.nonEmpty && b.references.nonEmpty &&
          a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (a.references.nonEmpty && b.references.nonEmpty &&
          b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    conjuncts(cond).iterator.flatMap {
      case FnExpr(fn, Seq(a, b)) if rewritable(fn) =>
        sides(a, b).map { case (l, r) => (l, r, 0.0) }
      case FnExpr("st_dwithin", Seq(a, b, d)) if d.foldable =>
        val dist = d.eval() match {
          case n: java.lang.Number => n.doubleValue()
          case _ => Double.NaN
        }
        if (dist.isNaN || dist < 0) None
        else sides(a, b).map { case (l, r) => (l, r, dist) }
      case _ => None
    }.nextOption()
  }
}

/** Plans SpatialBroadcastJoin into its physical operator. */
class GraftJoinStrategy(spark: SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SpatialBroadcastJoin(l, r, lg, rg, cond, buildLeft, expand) =>
      SpatialBroadcastJoinExec(planLater(l), planLater(r), lg, rg, cond, buildLeft, expand) :: Nil
    case _ => Nil
  }
}

case class SpatialBroadcastJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    lGeom: Expression,
    rGeom: Expression,
    condition: Expression,
    buildLeft: Boolean,
    expand: Double) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    streamed.outputPartitioning

  private def streamed: SparkPlan = if (buildLeft) right else left
  private def build: SparkPlan = if (buildLeft) left else right

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SpatialBroadcastJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val buildGeom = BindReferences.bindReference(
      if (buildLeft) lGeom else rGeom, build.output)
    val streamGeom = if (buildLeft) rGeom else lGeom
    val boundStreamGeom = BindReferences.bindReference(streamGeom, streamed.output)
    // executeCollect is bounded by the rule's broadcast threshold
    val buildRows = build.executeCollect().map(_.copy())
    val bc = sparkContext.broadcast(buildRows)
    val bcId = bc.id
    val bLeft = buildLeft
    val expandBy = expand
    val condExpr = condition
    val outAttrs = output
    streamed.execute().mapPartitions { iter =>
      val tree = SpatialBroadcastJoinExec.treeFor(bcId, bc.value, buildGeom)
      val joiner = new JoinedRow
      val pred = Predicate.create(condExpr, outAttrs)
      pred.initialize(org.apache.spark.TaskContext.getPartitionId())
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { streamRow =>
        val gv = boundStreamGeom.eval(streamRow)
        val env = if (gv == null) null else try {
          graft.geom.Wkb.envelope(gv.asInstanceOf[Array[Byte]])
        } catch { case _: Exception => null }
        if (env == null) Iterator.empty
        else {
          val cands = tree.query(new org.locationtech.jts.geom.Envelope(
            env(0) - expandBy, env(2) + expandBy, env(1) - expandBy, env(3) + expandBy))
          // Lazy map/filter keeps the operator-row contract: proj reuses its
          // UnsafeRow buffer, so it must run exactly once per next() and the
          // emitted row stays valid until the consumer pulls again. (An eager
          // lookahead here overwrote emitted rows whenever a streamed row had
          // more than one match.)
          scala.jdk.CollectionConverters.IteratorHasAsScala(cands.iterator()).asScala
            .map { b =>
              val buildRow = b.asInstanceOf[InternalRow]
              if (bLeft) joiner(buildRow, streamRow) else joiner(streamRow, buildRow)
            }
            .filter(pred.eval(_))
            .map(proj(_))
        }
      }
    }
  }
}

object SpatialBroadcastJoinExec {
  // One STRtree per (executor, broadcast) instead of per task: the build is
  // O(n log n) and tasks on the same executor share it. Bounded: entries are
  // dropped wholesale past 8 live broadcasts (a broadcast id is unique per
  // query execution, so stale entries are dead weight, not correctness).
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, STRtree]()

  private[plans] def treeFor(id: Long, rows: Array[InternalRow],
      geom: Expression): STRtree = {
    val hit = cache.get(id)
    if (hit != null) return hit
    val tree = new STRtree()
    var i = 0
    while (i < rows.length) {
      val gv = geom.eval(rows(i))
      if (gv != null) {
        val env = try graft.geom.Wkb.envelope(gv.asInstanceOf[Array[Byte]])
        catch { case _: Exception => null }
        if (env != null)
          tree.insert(new org.locationtech.jts.geom.Envelope(env(0), env(2), env(1), env(3)), rows(i))
      }
      i += 1
    }
    tree.build()
    if (cache.size >= 8) cache.clear()
    cache.put(id, tree)
    tree
  }
}
