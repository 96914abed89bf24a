package graft

import graft.functions.{FnExpr, FnRegistry, GeoAggregates}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range => LRange}

/**
 * Registration entry point — the Spark analogue of the reference's extension
 * load (/root/reference/spatial/src/spatial_extension.cpp:95-100 loading
 * core/proj/gdal/geos/geographiclib into the catalog).
 *
 * Two ways in:
 *  - `Graft.register(spark)` — imperative, for an existing session;
 *  - `spark.sql.extensions=graft.GraftExtensions` — declarative, injects the
 *    functions and the spatial-join optimizer rule at session build.
 */
object Graft {

  /** name → builder for every scalar function + the 5 aggregates. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = {
    val scalars = FnRegistry.names.map { name =>
      name -> ((exprs: Seq[Expression]) => FnExpr(name, exprs): Expression)
    }
    val aggs: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "st_extent_agg" -> (exprs => GeoAggregates.StExtentAgg(exprs.head)),
      "st_envelope_agg" -> (exprs => GeoAggregates.StExtentAgg(exprs.head)),
      "st_union_agg" -> (exprs => GeoAggregates.StUnionAgg(exprs.head)),
      "st_intersection_agg" -> (exprs => GeoAggregates.StIntersectionAgg(exprs.head)),
      "st_collect_agg" -> (exprs => GeoAggregates.StCollectAgg(exprs.head)))
    scalars ++ aggs
  }

  /** ST_GeneratePoints table function (reference:
   *  core/functions/table/st_generatepoints.cpp): seeded uniform points, as a
   *  distributed Range + the pcg32 skip-ahead expression.
   *  SQL: `SELECT point FROM st_generatepoints(minx, miny, maxx, maxy, count [, seed])`. */
  def generatePointsPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 5 || exprs.length == 6,
      "st_generatepoints(minx, miny, maxx, maxy, count [, seed])")
    require(exprs.forall(_.foldable), "st_generatepoints arguments must be constants")
    def d(e: Expression): Double = e.eval(null) match {
      case x: Double => x
      case x: Int => x.toDouble
      case x: Long => x.toDouble
      case x: java.math.BigDecimal => x.doubleValue()
      case x: org.apache.spark.sql.types.Decimal => x.toDouble
    }
    def l(e: Expression): Long = e.eval(null) match {
      case x: Long => x
      case x: Int => x.toLong
    }
    val Seq(minX, minY, maxX, maxY) = exprs.take(4).map(d)
    val count = l(exprs(4))
    val seed = if (exprs.length == 6) l(exprs(5)) else 0L
    val range = LRange(0, count, 1, None)
    Project(Seq(Alias(
      FnExpr("st_generatepoint", Seq(
        Literal(seed), range.output.head,
        Literal(minX), Literal(minY), Literal(maxX), Literal(maxY))), "point")()), range)
  }

  /** ST_Read table function — the reference's replacement-scan UX
   *  (st_read.cpp:538-553): `SELECT * FROM st_read('/path/file.shp')` resolves
   *  to a DataSourceV2 relation over the geo source. */
  def stReadPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.nonEmpty && exprs.head.foldable, "st_read(path) needs a constant path")
    val path = exprs.head.eval(null).toString
    val paths = graft.io.GeoFiles.expand(path)
    val fmt = graft.io.GeoFiles.formatOf(paths, None)
    val schema = graft.io.GeoFiles.schemaFor(fmt, paths)
    val table = new graft.io.GeoTable(schema, paths, fmt)
    org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation.create(
      table, None, None)
  }

  /** Idempotent per-session function registration. Skips names the
   *  GraftExtensions injection already placed in the session registry, so
   *  calling both paths doesn't log a replacement warning per function. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    val tfr = spark.sessionState.tableFunctionRegistry
    if (!tfr.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("st_generatepoints")))
      tfr.createOrReplaceTempFunction("st_generatepoints", generatePointsPlan, "built-in")
    if (!tfr.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("st_read")))
      tfr.createOrReplaceTempFunction("st_read", stReadPlan, "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Graft.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectTableFunction((
      FunctionIdentifier("st_generatepoints"),
      new ExpressionInfo("graft", "st_generatepoints"),
      Graft.generatePointsPlan))
    ext.injectTableFunction((
      FunctionIdentifier("st_read"),
      new ExpressionInfo("graft", "st_read"),
      Graft.stReadPlan))
    ext.injectOptimizerRule(spark => new graft.plans.SpatialJoinRule(spark))
    ext.injectOptimizerRule(spark => new graft.plans.BboxSkippingRule(spark))
  }
}
