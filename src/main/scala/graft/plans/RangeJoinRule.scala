package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Numeric/temporal interval-join acceleration — the 1-D analog of
 * [[SpatialJoinRule]]'s grid tile join (reference: the IEJoin the rewriter in
 * /root/reference/spatial/src/spatial/core/optimizer_rules.cpp:33-279 targets
 * handles exactly this class natively in the reference engine).
 *
 * Spark plans   a JOIN b ON a.x BETWEEN b.lo AND b.hi   with no equi-key as a
 * BroadcastNestedLoopJoin (small side) or CartesianProduct — O(|a|·|b|)
 * comparisons, quadratic at 100 TB. Rewrite to a BIN EQUI-JOIN:
 *
 *   bin(v)      = floor(v / w)                       -- w = bin width
 *   point side  : __graft_bin_p = bin(x)             -- exactly ONE bin
 *   interval side: explode(sequence(bin(lo), bin(hi))) AS __graft_bin_i
 *   JOIN ON __graft_bin_p = __graft_bin_i            -- hash-partitionable!
 *        AND <original condition>                    -- exact residual
 *
 * The point falls in exactly one bin, so every qualifying pair meets in
 * exactly one (binP, binI) bucket — no dedup pass needed. floor(v/w) is
 * monotone in v even under double rounding, so bin(x) ∈ [bin(lo), bin(hi)]
 * whenever lo ≤ x ≤ hi: no false negatives; false positives die in the
 * residual.
 *
 * Fires only when the join has NO equi-conjunct between the sides (with one,
 * Catalyst already picks a shuffled hash/sort-merge join keyed on it).
 * Strict bounds (<, >) qualify too — binning is bbox-style overcount.
 *
 * Tuning: spark.graft.rangeJoin.enabled (default true) and
 * spark.graft.rangeJoin.binWidth (default "auto": sample up to 1000 interval
 * rows at planning time, use max(median length, tiny) so a typical interval
 * spans 1–2 bins; cached per canonicalized plan like the spatial cell size).
 * Degenerate/reversed intervals (hi < lo) explode to zero bins.
 */
class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean

  private val widthCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !alreadyRewritten(cond) && !hasEquiConjunct(cond, left, right) =>
        findInterval(cond, left, right) match {
          case Some(iv) => rewrite(j, cond, iv)
          case None => j
        }
    }
  }

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists {
      case a: AttributeReference => a.name.startsWith("__graft_bin")
      case _ => false
    }

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.nonEmpty && b.references.nonEmpty) &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
           (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet)))
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** point expr x on one side; lo/hi exprs on the other; pointOnLeft. */
  private case class IntervalPred(x: Expression, lo: Expression, hi: Expression,
                                  pointOnLeft: Boolean)

  /** Find x ≥/> lo and x ≤/< hi conjuncts where x (same expr) sits on one
   *  join side and both bounds on the other. */
  private def findInterval(cond: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[IntervalPred] = {
    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // normalize every inequality conjunct to (smaller, larger)
    val ineqs: Seq[(Expression, Expression)] = splitConjuncts(cond).collect {
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b)        => (b, a)
      case LessThanOrEqual(a, b)    => (a, b)
      case LessThan(a, b)           => (a, b)
    }
    // lower bound: (lo, x); upper bound: (x, hi)
    val cands = for {
      (lo, x1) <- ineqs
      (x2, hi) <- ineqs
      if x1.semanticEquals(x2) && !(lo eq hi)
      if x1.deterministic && lo.deterministic && hi.deterministic
      if supported(x1.dataType) && supported(lo.dataType) && supported(hi.dataType)
      ps <- sideOf(x1); ls <- sideOf(lo); hs <- sideOf(hi)
      if ls == hs && ps != ls
    } yield IntervalPred(x1, lo, hi, pointOnLeft = ps)
    cands.headOption
  }

  // TimeZoneAwareExpressions (Cast, Sequence) built inside an optimizer rule
  // must carry an explicit zone or the plan flips back to unresolved
  private def tz: Option[String] = Some(spark.sessionState.conf.sessionLocalTimeZone)

  private def toD(e: Expression): Expression = e.dataType match {
    case DoubleType => e
    case _ => Cast(e, DoubleType, tz)
  }

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(toD(e), Literal(w)))

  private def binWidth(intervalPlan: LogicalPlan, lo: Expression, hi: Expression): Double = {
    val conf = spark.conf.get("spark.graft.rangeJoin.binWidth", "auto")
    if (!conf.equalsIgnoreCase("auto")) return conf.toDouble
    val key = s"${intervalPlan.canonicalized.hashCode()}:${lo.canonicalized.hashCode()}:" +
      s"${hi.canonicalized.hashCode()}"
    val hit = widthCache.get(key)
    if (hit != null) return hit.doubleValue()
    val lens = try {
      val len = Alias(Subtract(toD(hi), toD(lo)), "__len")()
      val probe = Limit(Literal(1000), Project(Seq(len), intervalPlan))
      spark.sessionState.executePlan(probe).executedPlan.executeCollect()
        .filterNot(_.isNullAt(0)).map(_.getDouble(0))
        .filter(d => !d.isNaN && !d.isInfinite && d >= 0).sorted.toSeq
    } catch {
      case e: Exception =>
        logWarning(s"range-join binWidth=auto sampling failed (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}); using 1.0")
        Seq.empty
    }
    val w =
      if (lens.isEmpty) 1.0
      else math.max(lens(lens.length / 2), 1e-9) // all-degenerate intervals: any width
    widthCache.put(key, w)
    w
  }

  private def rewrite(j: Join, cond: Expression, iv: IntervalPred): LogicalPlan = {
    val (pointPlan, intvPlan) =
      if (iv.pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val w = binWidth(intvPlan, iv.lo, iv.hi)

    val binP = Alias(bin(iv.x, w), "__graft_bin_p")()
    val pointSide = Project(pointPlan.output :+ binP, pointPlan)

    val binLo = bin(iv.lo, w)
    val binHi = bin(iv.hi, w)
    val emptyBins = Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
    // reversed/NULL intervals → zero bins (residual would reject them anyway)
    val bins = If(And(And(IsNotNull(binLo), IsNotNull(binHi)),
                      LessThanOrEqual(binLo, binHi)),
      Sequence(binLo, binHi, Some(Literal(1L)), tz), emptyBins)
    val binI = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    val intvSide = Generate(Explode(bins), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binI), child = intvPlan)

    val equi = EqualTo(binP.toAttribute, binI)
    val newCond = And(equi, cond)
    val (newL, newR) = if (iv.pointOnLeft) (pointSide, intvSide) else (intvSide, pointSide)
    Project(j.output, Join(newL, newR, Inner, Some(newCond), j.hint))
  }
}
