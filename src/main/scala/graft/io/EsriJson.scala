package graft.io

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing, Polygon}

/** ESRIJSON (ArcGIS REST API FeatureSet) reader — the format the reference
  * opens through GDAL's ESRIJSON driver (internals.md driver table).
  * Implements the published ArcGIS REST geometry objects: point `{x, y}`,
  * multipoint `{points}`, polyline `{paths}`, polygon `{rings}` with the
  * documented ring convention (outer rings clockwise, holes
  * counter-clockwise; holes attach to the outer ring that contains them,
  * several outer rings form a multipolygon). Attributes surface through the
  * dynamic `properties` schema like GeoJSON. */
object EsriJson {

  private val f = new GeometryFactory()

  def features(path: String): Iterator[GeoJsonFile.Feature] =
    fromString(GeoFiles.readAllText(path), path)

  def fromString(text: String, src: String): Iterator[GeoJsonFile.Feature] = {
    val doc = JsonMini.parse(text) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(s"'$src' is not a JSON object")
    }
    val feats = doc.get("features") match {
      case Some(v: Vector[Any @unchecked]) => v
      case _ => throw new IllegalArgumentException(
        s"'$src' is not an ESRIJSON FeatureSet (no 'features' array)")
    }
    // OBJECTID-style id field, when declared
    val oidField = doc.get("fields").collect { case fs: Vector[Any @unchecked] =>
      fs.collectFirst {
        case fm: Map[String @unchecked, Any @unchecked]
          if fm.get("type").contains("esriFieldTypeOID") => fm("name").asInstanceOf[String]
      }
    }.flatten.getOrElse("OBJECTID")

    feats.iterator.map { fAny =>
      val fm = fAny.asInstanceOf[Map[String, Any]]
      val attrs = fm.get("attributes") match {
        case Some(m: Map[String @unchecked, Any @unchecked]) =>
          m.map { case (k, v) => k -> JsonMini.scalarString(v) }
        case _ => Map.empty[String, String]
      }
      val geom = fm.get("geometry") match {
        case Some(g: Map[String @unchecked, Any @unchecked]) => geometry(g)
        case _ => null
      }
      GeoJsonFile.Feature(attrs.getOrElse(oidField, null), geom, attrs)
    }
  }

  private def coord(p: Vector[Any]): Coordinate =
    new Coordinate(p(0).asInstanceOf[Double], p(1).asInstanceOf[Double])

  def geometry(g: Map[String, Any]): Geometry = {
    if (g.contains("x") && g.contains("y"))
      f.createPoint(new Coordinate(g("x").asInstanceOf[Double], g("y").asInstanceOf[Double]))
    else if (g.contains("points"))
      f.createMultiPoint(g("points").asInstanceOf[Vector[Any]]
        .map(p => f.createPoint(coord(p.asInstanceOf[Vector[Any]]))).toArray)
    else if (g.contains("paths")) {
      val ls = g("paths").asInstanceOf[Vector[Any]].map { p =>
        f.createLineString(p.asInstanceOf[Vector[Any]].map(c => coord(c.asInstanceOf[Vector[Any]])).toArray)
      }
      if (ls.length == 1) ls.head else f.createMultiLineString(ls.toArray)
    } else if (g.contains("rings")) assembleRings(g("rings").asInstanceOf[Vector[Any]])
    else throw new IllegalArgumentException(
      s"unsupported ESRIJSON geometry (keys: ${g.keys.toSeq.sorted.mkString(", ")})")
  }

  /** ArcGIS ring convention: clockwise = outer, counter-clockwise = hole;
    * each hole belongs to the outer ring containing it. Writers that emit
    * only counter-clockwise rings (no outer) get every ring as an outer —
    * the GDAL driver applies the same forgiveness. */
  private def assembleRings(ringsAny: Vector[Any]): Geometry = {
    val rings: Vector[LinearRing] = ringsAny.map { r =>
      val cs0 = r.asInstanceOf[Vector[Any]].map(c => coord(c.asInstanceOf[Vector[Any]])).toArray
      val cs = if (cs0.head.equals2D(cs0.last)) cs0 else cs0 :+ cs0.head.copy()
      f.createLinearRing(cs)
    }
    def signedArea(r: LinearRing): Double = {
      val cs = r.getCoordinates
      var a = 0.0
      var i = 0
      while (i < cs.length - 1) {
        a += cs(i).x * cs(i + 1).y - cs(i + 1).x * cs(i).y
        i += 1
      }
      a / 2
    }
    // clockwise in screen convention = negative shoelace area
    val (outers0, holes) = rings.partition(signedArea(_) < 0)
    val outers = if (outers0.nonEmpty) outers0 else rings
    val holeSet = if (outers0.nonEmpty) holes else Vector.empty[LinearRing]
    // each hole belongs to the SMALLEST outer ring containing it — an
    // island-in-lake-in-state nesting must not attach the innermost hole
    // to every enclosing shell
    val shells = outers.map(o => (o, f.createPolygon(o)))
    val assigned: Map[Int, Vector[LinearRing]] = holeSet.flatMap { h =>
      val pt = f.createPoint(h.getCoordinateN(0))
      val containing = shells.zipWithIndex.filter { case ((_, shell), _) =>
        shell.contains(pt) || shell.getBoundary.distance(pt) == 0.0
      }
      if (containing.isEmpty) None
      else Some(containing.minBy(_._1._2.getArea)._2 -> h)
    }.groupBy(_._1).map { case (i, hs) => i -> hs.map(_._2) }
    val polys = outers.zipWithIndex.map { case (o, i) =>
      f.createPolygon(o, assigned.getOrElse(i, Vector.empty).toArray)
    }
    if (polys.length == 1) polys.head else f.createMultiPolygon(polys.toArray[Polygon])
  }
}
