package graft.geom

/**
 * Space-filling-curve + tiling encoders.
 *
 * `hilbert` mirrors the reference's semantics (16 bits per dimension within a
 * bounding box, 32-bit index — /root/reference/spatial/src/spatial/core/functions/
 * scalar/st_hilbert.cpp:19-95): it is the clustering key that replaces the R-tree
 * (SURVEY §4.3) — `ORDER BY st_hilbert(geom, extent)` before writing Parquet gives
 * row-group locality, so bbox min/max column stats prune like an index scan.
 */
object Curves {

  /** Map x in [min,max] to a 16-bit cell. */
  private def q16(v: Double, min: Double, max: Double): Int = {
    if (max <= min) return 0
    val t = (v - min) / (max - min)
    val i = (t * 65535.0).toInt
    if (i < 0) 0 else if (i > 65535) 65535 else i
  }

  /** Hilbert curve index of 16-bit (x, y) — classic Warren/Hamilton bit-twiddle. */
  def hilbertXY(xIn: Int, yIn: Int): Long = {
    var x = xIn & 0xffff
    var y = yIn & 0xffff
    var rx = 0; var ry = 0
    var d = 0L
    var s = 1 << 15
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(x: Double, y: Double, minX: Double, minY: Double, maxX: Double, maxY: Double): Long =
    hilbertXY(q16(x, minX, maxX), q16(y, minY, maxY))

  /** Bing-maps quadkey of the tile containing (lon, lat) at `level`
   *  (reference: st_quadkey.cpp — standard public algorithm). */
  def quadKey(lon: Double, lat: Double, level: Int): String = {
    require(level >= 1 && level <= 23, s"ST_QuadKey: level must be between 1 and 23, got $level")
    val latC = math.max(-85.05112878, math.min(85.05112878, lat))
    val lonC = math.max(-180.0, math.min(180.0, lon))
    val sinLat = math.sin(latC * math.Pi / 180.0)
    val xT = (lonC + 180.0) / 360.0
    val yT = 0.5 - math.log((1 + sinLat) / (1 - sinLat)) / (4 * math.Pi)
    val size = 1 << level
    var tx = math.min(size - 1, math.max(0, (xT * size).toInt))
    var ty = math.min(size - 1, math.max(0, (yT * size).toInt))
    val sb = new java.lang.StringBuilder(level)
    var i = level
    while (i > 0) {
      var digit = '0'
      val mask = 1 << (i - 1)
      if ((tx & mask) != 0) digit = (digit + 1).toChar
      if ((ty & mask) != 0) digit = (digit + 2).toChar
      sb.append(digit)
      i -= 1
    }
    sb.toString
  }
}
