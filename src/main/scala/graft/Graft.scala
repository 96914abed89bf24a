package graft

import graft.functions.{FnExpr, FnRegistry, GeoAggregates}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  /** Idempotent per-session function registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
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
    ext.injectOptimizerRule(spark => new graft.plans.SpatialJoinRule(spark))
    ext.injectOptimizerRule(spark => new graft.plans.BboxSkippingRule(spark))
  }
}
