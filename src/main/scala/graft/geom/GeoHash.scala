package graft.geom

/**
 * Geohash encode/decode (the public base-32 bit-interleaving scheme;
 * PostGIS ST_GeoHash / ST_GeomFromGeoHash surface — not in the reference's
 * docs/functions.md, provided as beyond-reference parity because a geohash
 * prefix is a standard spatial partition/bucket key at cluster scale).
 *
 * Bit order is the published convention: the first (most significant) bit
 * halves LONGITUDE, the second LATITUDE, alternating; every 5 bits emit one
 * character of the base-32 alphabet (i, l, o omitted).
 *
 * Determinism note: encoding bisection midpoints are exact dyadic doubles
 * down to ~45 halvings, so for precisions <= 8 chars the bisection is
 * bit-identical to the closed form floor((lon+180)/360 * 2^bits) — which is
 * what the plain-SQL DuckDB oracle computes (q_geohash).
 */
object GeoHash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    var i = 0
    while (i < Alphabet.length) { a(Alphabet.charAt(i)) = i; i += 1 }
    a
  }

  /** Max precision PostGIS emits for a point (20 chars = 100 bits). */
  val MaxChars = 20

  /** Encode a lon/lat point to `chars` geohash characters. */
  def encode(lon: Double, lat: Double, chars: Int): String = {
    if (lon < -180 || lon > 180 || lat < -90 || lat > 90)
      throw new IllegalArgumentException(
        s"ST_GeoHash: coordinates must be lon/lat in EPSG:4326 ranges, got ($lon, $lat)")
    val n = math.max(1, math.min(chars, MaxChars))
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    val sb = new java.lang.StringBuilder(n)
    var even = true
    var bits = 0; var acc = 0
    while (sb.length < n) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { acc = (acc << 1) | 1; lonLo = mid } else { acc <<= 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { acc = (acc << 1) | 1; latLo = mid } else { acc <<= 1; latHi = mid }
      }
      even = !even
      bits += 1
      if (bits == 5) { sb.append(Alphabet.charAt(acc)); bits = 0; acc = 0 }
    }
    sb.toString
  }

  /** Decode a geohash to its cell (lonMin, latMin, lonMax, latMax). */
  def bbox(hash: String): (Double, Double, Double, Double) = {
    if (hash == null || hash.isEmpty)
      throw new IllegalArgumentException("ST_GeomFromGeoHash: empty geohash")
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var even = true
    var i = 0
    while (i < hash.length) {
      val c = hash.charAt(i).toLower
      val v = if (c < 128) Decode(c) else -1
      if (v < 0)
        throw new IllegalArgumentException(
          s"ST_GeomFromGeoHash: invalid geohash character '${hash.charAt(i)}' in '$hash'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    (lonLo, latLo, lonHi, latHi)
  }

  /** Cell center (the ST_PointFromGeoHash point). */
  def center(hash: String): (Double, Double) = {
    val (x0, y0, x1, y1) = bbox(hash)
    ((x0 + x1) / 2, (y0 + y1) / 2)
  }

  /** PostGIS ST_GeoHash semantics for an arbitrary geometry envelope:
   *  precision = the number of leading characters the envelope's SW and NE
   *  corners share (i.e. the smallest cell still containing the whole
   *  envelope), hash = the envelope midpoint at that precision. A point
   *  (zero-extent envelope) gets full 20-char precision. `maxChars > 0`
   *  overrides the derived precision. */
  def encodeEnvelope(minX: Double, minY: Double, maxX: Double, maxY: Double, maxChars: Int): String = {
    val cx = (minX + maxX) / 2
    val cy = (minY + maxY) / 2
    val n =
      if (maxChars > 0) maxChars
      else {
        val sw = encode(minX, minY, MaxChars)
        val ne = encode(maxX, maxY, MaxChars)
        var p = 0
        while (p < MaxChars && sw.charAt(p) == ne.charAt(p)) p += 1
        if (p == 0) return "" // envelope spans more than half the world
        p
      }
    encode(cx, cy, n)
  }
}
