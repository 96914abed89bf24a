package graft.io

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing}

/** TopoJSON topology reader (the format the reference opens through GDAL's
  * TopoJSON driver — internals.md driver table). Implements the TopoJSON
  * 1.0 specification: a `Topology` document holds a shared `arcs` table —
  * delta-encoded quantized positions when a `transform` is present,
  * absolute positions otherwise — and named geometry `objects` whose
  * LineString/Polygon geometries reference arcs by index, with ones'
  * complement (~i) marking a reversed traversal. Object names surface as
  * layers (`properties['layer']`), matching the GDAL driver's
  * one-layer-per-object model. */
object TopoJson {

  private val f = new GeometryFactory()

  def features(path: String, layer: Option[String]): Iterator[GeoJsonFile.Feature] =
    fromString(GeoFiles.readAllText(path), layer, path)

  def layers(path: String): Seq[String] =
    root(GeoFiles.readAllText(path), path)("objects")
      .asInstanceOf[Map[String, Any]].keys.toSeq.sorted

  private def root(text: String, src: String): Map[String, Any] = {
    val doc = JsonMini.parse(text) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(s"'$src' is not a JSON object")
    }
    if (!doc.get("type").contains("Topology")) throw new IllegalArgumentException(
      s"'$src' is not a TopoJSON document (type=${doc.getOrElse("type", "?")})")
    if (!doc.contains("objects") || !doc.contains("arcs")) throw new IllegalArgumentException(
      s"'$src' misses the required TopoJSON members 'objects'/'arcs'")
    doc
  }

  def fromString(text: String, layer: Option[String], src: String): Iterator[GeoJsonFile.Feature] = {
    val doc = root(text, src)

    // transform: positions quantized to integers; x = xq * sx + tx
    val transform = doc.get("transform").map { t =>
      val m = t.asInstanceOf[Map[String, Any]]
      val sc = m("scale").asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double])
      val tr = m("translate").asInstanceOf[Vector[Any]].map(_.asInstanceOf[Double])
      (sc(0), sc(1), tr(0), tr(1))
    }

    // decode the shared arc table once: with a transform, each arc's first
    // position is absolute quantized and the rest are deltas (spec §2.1.3)
    val arcs: Array[Array[Coordinate]] =
      doc("arcs").asInstanceOf[Vector[Any]].map { a =>
        val pts = a.asInstanceOf[Vector[Any]].map(_.asInstanceOf[Vector[Any]])
        transform match {
          case Some((sx, sy, tx, ty)) =>
            var cx = 0.0; var cy = 0.0
            pts.map { p =>
              cx += p(0).asInstanceOf[Double]; cy += p(1).asInstanceOf[Double]
              new Coordinate(cx * sx + tx, cy * sy + ty)
            }.toArray
          case None =>
            pts.map(p => new Coordinate(p(0).asInstanceOf[Double], p(1).asInstanceOf[Double])).toArray
        }
      }.toArray

    def pointCoord(p: Vector[Any]): Coordinate = transform match {
      case Some((sx, sy, tx, ty)) =>
        new Coordinate(p(0).asInstanceOf[Double] * sx + tx, p(1).asInstanceOf[Double] * sy + ty)
      case None => new Coordinate(p(0).asInstanceOf[Double], p(1).asInstanceOf[Double])
    }

    /** stitch an arc-index list into one coordinate path; ~i (negative)
      * traverses arc (-i-1) reversed; shared junction points dedupe */
    def path(idxs: Vector[Any]): Array[Coordinate] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
      idxs.foreach { vi =>
        val raw = vi.asInstanceOf[Double].toInt
        val (arc0, rev) = if (raw >= 0) (arcs(raw), false) else (arcs(-raw - 1), true)
        val arc = if (rev) arc0.reverse else arc0
        val start = if (out.nonEmpty && out.last.equals2D(arc.head)) 1 else 0
        var i = start
        while (i < arc.length) { out += arc(i); i += 1 }
      }
      out.toArray
    }

    def ring(idxs: Vector[Any]): LinearRing = {
      val cs0 = path(idxs)
      val cs = if (cs0.head.equals2D(cs0.last)) cs0 else cs0 :+ cs0.head.copy()
      f.createLinearRing(cs)
    }

    def polygon(ringsArcs: Vector[Any]): Geometry = {
      val rs = ringsArcs.map(r => ring(r.asInstanceOf[Vector[Any]]))
      f.createPolygon(rs.head, rs.tail.toArray)
    }

    def geometry(o: Map[String, Any]): Geometry = o.getOrElse("type", null) match {
      case "Point" => f.createPoint(pointCoord(o("coordinates").asInstanceOf[Vector[Any]]))
      case "MultiPoint" =>
        f.createMultiPoint(o("coordinates").asInstanceOf[Vector[Any]]
          .map(p => f.createPoint(pointCoord(p.asInstanceOf[Vector[Any]]))).toArray)
      case "LineString" => f.createLineString(path(o("arcs").asInstanceOf[Vector[Any]]))
      case "MultiLineString" =>
        f.createMultiLineString(o("arcs").asInstanceOf[Vector[Any]]
          .map(a => f.createLineString(path(a.asInstanceOf[Vector[Any]]))).toArray)
      case "Polygon" => polygon(o("arcs").asInstanceOf[Vector[Any]])
      case "MultiPolygon" =>
        f.createMultiPolygon(o("arcs").asInstanceOf[Vector[Any]]
          .map(p => polygon(p.asInstanceOf[Vector[Any]]).asInstanceOf[org.locationtech.jts.geom.Polygon])
          .toArray)
      case "GeometryCollection" =>
        f.createGeometryCollection(o.getOrElse("geometries", Vector.empty)
          .asInstanceOf[Vector[Any]].map(g => geometry(g.asInstanceOf[Map[String, Any]])).toArray)
      case t => throw new IllegalArgumentException(s"unsupported TopoJSON geometry type '$t'")
    }

    def feature(name: String, o: Map[String, Any]): GeoJsonFile.Feature = {
      val props = o.get("properties") match {
        case Some(m: Map[String @unchecked, Any @unchecked]) =>
          m.map { case (k, v) => k -> JsonMini.scalarString(v) }
        case _ => Map.empty[String, String]
      }
      val id = o.get("id").map(JsonMini.scalarString).orNull
      GeoJsonFile.Feature(id, geometry(o), props + ("layer" -> name))
    }

    val objects = doc("objects").asInstanceOf[Map[String, Any]]
    val selected = layer match {
      case Some(l) =>
        if (!objects.contains(l)) throw new IllegalArgumentException(
          s"TopoJSON object '$l' not found in '$src' (objects: ${objects.keys.toSeq.sorted.mkString(", ")})")
        Seq(l -> objects(l))
      case None => objects.toSeq.sortBy(_._1)
    }
    selected.iterator.flatMap { case (name, objAny) =>
      val obj = objAny.asInstanceOf[Map[String, Any]]
      // a top-level GeometryCollection is the conventional feature container
      // (one feature per member); any other geometry is a single feature
      obj.getOrElse("type", null) match {
        case "GeometryCollection" =>
          obj.getOrElse("geometries", Vector.empty).asInstanceOf[Vector[Any]]
            .iterator.map(g => feature(name, g.asInstanceOf[Map[String, Any]]))
        case _ => Iterator.single(feature(name, obj))
      }
    }
  }
}
