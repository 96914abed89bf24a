package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial write paths.
 *
 * `geojsonl` replaces the reference's GDAL COPY sink (st_write.cpp) — but
 * per-partition files instead of its single global-mutex writer (st_write.cpp:46-55),
 * so the sink scales with the cluster.
 *
 * `clusteredParquet` is the R-tree replacement (SURVEY §4.3): rows are
 * Hilbert-ordered on the geometry centroid and written with a sibling
 * `<geom>_bbox` struct column, so Parquet row-group min/max statistics give
 * index-grade pruning (the declarative equivalent of
 * rtree_index_create_logical.cpp's sort-tile-recursive bulk load), and
 * [[graft.plans.BboxSkippingRule]] derives pushable bbox predicates from
 * spatial filters automatically.
 */
object GeoWriter {

  /** Write `df` as newline-delimited GeoJSON features. All non-geometry
   *  columns become properties (JSON-typed via to_json). */
  def geojsonl(df: DataFrame, geomCol: String, path: String): Unit = {
    graft.Graft.register(df.sparkSession)
    val props = df.columns.filter(_ != geomCol)
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      expr(s"st_asgeojson($geomCol)"),
      lit(""","properties":"""),
      to_json(struct(props.map(col).toIndexedSeq: _*)),
      lit("}"))
    df.select(line.as("value")).write.mode("overwrite").text(path)
  }

  /** Hilbert-clustered parquet with bbox stats column. Bounds are taken from
   *  the data (one cheap aggregate) unless given. */
  def clusteredParquet(
      df: DataFrame,
      geomCol: String,
      path: String,
      bounds: Option[(Double, Double, Double, Double)] = None,
      targetPartitions: Int = 0): Unit = {
    graft.Graft.register(df.sparkSession)
    val (minX, minY, maxX, maxY) = bounds.getOrElse {
      val r = df.selectExpr(
        s"min(st_xmin($geomCol))", s"min(st_ymin($geomCol))",
        s"max(st_xmax($geomCol))", s"max(st_ymax($geomCol))").collect()(0)
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val withKeys = df
      .withColumn(s"${geomCol}_bbox", expr(s"st_extent($geomCol)"))
      .withColumn("__hilbert", expr(
        s"st_hilbert($geomCol, ${minX}d, ${minY}d, ${maxX}d, ${maxY}d)"))
    val parts = if (targetPartitions > 0) targetPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    withKeys
      .repartitionByRange(parts, col("__hilbert"))
      .sortWithinPartitions("__hilbert")
      .drop("__hilbert")
      .write.mode("overwrite").parquet(path)
  }
}
