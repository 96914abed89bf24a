package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** NOAA/VDatum `.gtx` vertical grid files — the PROJ `+geoidgrids=` format
  * (reference: ST_Transform delegates vertical datums to PROJ, which reads
  * geoid models — EGM96/GEOID18-style undulation grids — from GTX; the
  * format is documented by PROJ's gtx driver and NOAA VDatum).
  *
  * Layout (all big-endian):
  *   header, 40 bytes: float64 lat0, float64 lon0, float64 dLat,
  *   float64 dLon, int32 rows, int32 cols
  *   data: rows x cols float32 undulations in meters, row-major starting at
  *   the SOUTH-WEST corner (south row first, west-to-east within a row)
  *
  * lon0 is conventionally written in [0, 360) east longitude (VDatum);
  * lookups normalize the query longitude onto the grid's frame so both
  * [-180, 180] and [0, 360) headers resolve. The conventional no-data
  * sentinel is -88.8888.
  *
  * A CRS tagged with a geoid grid stores orthometric heights H; the
  * ellipsoidal height is h = H + N(lon, lat) with N the interpolated
  * undulation (PROJ's vgridshift convention).
  */
object Gtx {

  val NoData = -88.8888f

  final case class Grid(lat0: Double, lon0: Double, dLat: Double, dLon: Double,
                        rows: Int, cols: Int, values: Array[Float], source: String) {
    private val lonMax = lon0 + dLon * (cols - 1)
    private val latMax = lat0 + dLat * (rows - 1)

    /** Geoid undulation N in meters at (lonDeg, latDeg), bilinear between
      * the four surrounding nodes. Out-of-coverage and no-data cells fail
      * loudly: silently extrapolated heights are corrupt data. */
    def undulation(lonDeg: Double, latDeg: Double): Double = {
      // normalize the query longitude onto the grid's frame (grids are
      // written in either [-180,180] or [0,360) east longitude)
      var lon = lonDeg
      while (lon < lon0 - 1e-9 && lon + 360 <= lonMax + 1e-9) lon += 360
      while (lon > lonMax + 1e-9 && lon - 360 >= lon0 - 1e-9) lon -= 360
      val fc = (lon - lon0) / dLon
      val fr = (latDeg - lat0) / dLat
      if (fc < -1e-9 || fc > cols - 1 + 1e-9 || fr < -1e-9 || fr > rows - 1 + 1e-9)
        throw new IllegalArgumentException(
          s"ST_Transform: ($lonDeg,$latDeg) is outside the +geoidgrids coverage of '$source' " +
            f"(lon [$lon0%.4f, $lonMax%.4f], lat [$lat0%.4f, $latMax%.4f])")
      val c0 = math.min(cols - 2, math.max(0, fc.toInt))
      val r0 = math.min(rows - 2, math.max(0, fr.toInt))
      val wx = fc - c0; val wy = fr - r0
      val v00 = values(r0 * cols + c0); val v01 = values(r0 * cols + c0 + 1)
      val v10 = values((r0 + 1) * cols + c0); val v11 = values((r0 + 1) * cols + c0 + 1)
      if (v00 == NoData || v01 == NoData || v10 == NoData || v11 == NoData)
        throw new IllegalArgumentException(
          s"ST_Transform: ($lonDeg,$latDeg) falls on a no-data cell of geoid grid '$source'")
      (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy
    }
  }

  def parse(bytes: Array[Byte], source: String): Grid = {
    if (bytes.length < 40) throw new IllegalArgumentException(
      s"ST_Transform: '$source' is too short to be a GTX grid (${bytes.length} bytes)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val lat0 = b.getDouble(0); val lon0 = b.getDouble(8)
    val dLat = b.getDouble(16); val dLon = b.getDouble(24)
    val rows = b.getInt(32); val cols = b.getInt(36)
    // the northernmost ROW sits at lat0 + dLat*(rows-1): a pole-to-pole
    // grid (EGM96-style, lat0=-90, 721 rows at 0.25 deg) ends exactly at 90
    if (rows < 2 || cols < 2 || rows.toLong * cols > 500000000L ||
        dLat <= 0 || dLon <= 0 || lat0 < -90.01 || lat0 + dLat * (rows - 1) > 90.01)
      throw new IllegalArgumentException(
        s"ST_Transform: '$source' has an implausible GTX header " +
          s"(lat0=$lat0 lon0=$lon0 dLat=$dLat dLon=$dLon rows=$rows cols=$cols)")
    if (bytes.length < 40L + 4L * rows * cols) throw new IllegalArgumentException(
      s"ST_Transform: GTX grid '$source' is truncated (${bytes.length} bytes for ${rows}x$cols nodes)")
    val v = new Array[Float](rows * cols)
    var i = 0
    while (i < v.length) { v(i) = b.getFloat(40 + 4 * i); i += 1 }
    Grid(lat0, lon0, dLat, dLon, rows, cols, v, source)
  }

  def write(g: Grid): Array[Byte] = {
    val out = ByteBuffer.allocate(40 + 4 * g.values.length).order(ByteOrder.BIG_ENDIAN)
    out.putDouble(g.lat0).putDouble(g.lon0).putDouble(g.dLat).putDouble(g.dLon)
    out.putInt(g.rows).putInt(g.cols)
    g.values.foreach(out.putFloat)
    out.array()
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Grid]()

  def load(path: String): Grid = cache.computeIfAbsent(path, { p =>
    val f = new java.io.File(p)
    if (!f.isFile) throw new IllegalArgumentException(
      s"ST_Transform: +geoidgrids file not found: '$p'")
    parse(java.nio.file.Files.readAllBytes(f.toPath), p)
  })

  /** Resolve a `+geoidgrids=` list — same grammar as `+nadgrids=`:
    * comma-separated paths, `@` prefix = optional (skipped when missing),
    * `null` = no-op sentinel. The first grid covering a query point wins
    * (multi-grid lists concatenate coverage). */
  def fromGeoidgridsSpec(spec: String): Option[Seq[Grid]] = {
    val parts = spec.split(",").map(_.trim).filter(_.nonEmpty)
    val grids = parts.flatMap { p =>
      val optional = p.startsWith("@")
      val path = if (optional) p.drop(1) else p
      if (path == "null") None
      else if (optional && !new java.io.File(path).isFile) None
      else Some(load(path))
    }
    if (grids.isEmpty) None else Some(grids.toSeq)
  }

  /** Undulation over a grid list: first grid whose coverage contains the
    * point answers (PROJ's multi-grid semantics). */
  def undulationOf(grids: Seq[Grid], lonDeg: Double, latDeg: Double): Double = {
    var i = 0
    var last: IllegalArgumentException = null
    while (i < grids.length) {
      try return grids(i).undulation(lonDeg, latDeg)
      catch { case e: IllegalArgumentException => last = e }
      i += 1
    }
    throw last
  }
}
