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

  /** Write `df` as a directory of per-partition shapefiles (part-N.shp/.shx/
   *  .dbf/.cpg). Geometry column must be WKB binary; other columns become DBF
   *  attributes. */
  def shapefile(df: DataFrame, geomCol: String, path: String): Unit = {
    new java.io.File(path).mkdirs()
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val fields = attrIdx.map { i =>
      val f = schema.fields(i)
      f.dataType match {
        case org.apache.spark.sql.types.LongType => ShapefileWriter.Field(f.name, 'N', 18, 0)
        case org.apache.spark.sql.types.IntegerType => ShapefileWriter.Field(f.name, 'N', 9, 0)
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          ShapefileWriter.Field(f.name, 'N', 20, 8)
        case org.apache.spark.sql.types.BooleanType => ShapefileWriter.Field(f.name, 'L', 1, 0)
        case _ => ShapefileWriter.Field(f.name, 'C', 80, 0)
      }
    }
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          (g, attrIdx.map(i => r.get(i)).toArray[Any])
        }
        ShapefileWriter.write(f"$path/part-$pid%05d", fields, rows)
      }
      ()
    }
  }

  /** Write `df` as a directory of per-partition FlatGeobuf files (no packed
   *  index — clustering/pruning is parquet's job in this engine). */
  def flatgeobuf(df: DataFrame, geomCol: String, path: String): Unit = {
    new java.io.File(path).mkdirs()
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val fields = attrIdx.map { i =>
      val f = schema.fields(i)
      FlatGeobufWriter.FgbField(f.name, FlatGeobufWriter.fgbType(f.dataType))
    }
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          (g, attrIdx.map(i => r.get(i)).toArray[Any])
        }
        // geometry type 0 (Unknown) + per-feature type tags handles mixed input
        FlatGeobufWriter.write(f"$path/part-$pid%05d.fgb", 0, fields, rows)
      }
      ()
    }
  }

  /** Write `df` as a directory of per-partition GeoPackage files (single
   *  feature table per file, hand-rolled sqlite pages — no sqlite dependency). */
  def geopackage(df: DataFrame, geomCol: String, path: String, table: String = "features"): Unit = {
    new java.io.File(path).mkdirs()
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = schema.fields.indices.filter(_ != geomIdx)
    val cols = attrIdx.map { i =>
      val f = schema.fields(i)
      (f.name, GeoPackageWriter.sqliteType(f.dataType))
    }
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (it.hasNext) {
        val rows = it.map { r =>
          val g = r.get(geomIdx) match {
            case b: Array[Byte] => graft.geom.Geo.read(b)
            case _ => null
          }
          val attrs = attrIdx.map(i => r.get(i) match {
            case b: Boolean => if (b) 1L else 0L
            case x: Int => x.toLong
            case x: Float => x.toDouble
            case other => other
          }).toArray[Any]
          (g, attrs)
        }
        GeoPackageWriter.write(f"$path/part-$pid%05d.gpkg", table, cols, rows)
      }
      ()
    }
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
