package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.GeoHash

class GeoHashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  test("published worked examples (the Wikipedia reference hashes)") {
    // the canonical geohash worked example: 57.64911 N, 10.40744 E
    assert(GeoHash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    // the original announcement example: 42.605 N, 5.603 W
    assert(GeoHash.encode(-5.603, 42.605, 5) == "ezs42")
    // prefixes nest: every shorter precision is a prefix of the longer
    for (n <- 1 to 11)
      assert(GeoHash.encode(10.40744, 57.64911, 11).startsWith(GeoHash.encode(10.40744, 57.64911, n)))
  }

  test("decode bbox is the exact dyadic cell and contains the point") {
    val (x0, y0, x1, y1) = GeoHash.bbox("ezs42")
    // 5 chars = 25 bits = 13 lon + 12 lat; cell sizes 360/2^13, 180/2^12
    assert(math.abs((x1 - x0) - 360.0 / 8192) < 1e-12)
    assert(math.abs((y1 - y0) - 180.0 / 4096) < 1e-12)
    assert(x0 <= -5.603 && -5.603 < x1 && y0 <= 42.605 && 42.605 < y1)
    // encode(center) round-trips to the same hash at the same precision
    val (cx, cy) = GeoHash.center("ezs42")
    assert(GeoHash.encode(cx, cy, 5) == "ezs42")
  }

  test("round-trip fuzz: encode -> bbox contains input at all precisions") {
    val rnd = new scala.util.Random(4326)
    (1 to 300).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val n = 1 + rnd.nextInt(12)
      val h = GeoHash.encode(lon, lat, n)
      assert(h.length == n)
      val (x0, y0, x1, y1) = GeoHash.bbox(h)
      assert(x0 <= lon && lon <= x1 && y0 <= lat && lat <= y1,
        s"($lon,$lat)@$n -> $h cell ($x0,$y0,$x1,$y1)")
    }
  }

  test("bisection equals the closed form the SQL oracle uses (precision 8)") {
    val rnd = new scala.util.Random(88)
    (1 to 300).foreach { _ =>
      // 2-decimal coordinates, the derivation q_geohash uses
      val lon = math.rint((rnd.nextDouble() * 360 - 180) * 100) / 100
      val lat = math.rint((rnd.nextDouble() * 180 - 90) * 100) / 100
      val lonb = math.min(math.floor((lon + 180.0) / 360.0 * 1048576.0).toLong, 1048575L)
      val latb = math.min(math.floor((lat + 90.0) / 180.0 * 1048576.0).toLong, 1048575L)
      var iv = 0L
      var j = 0
      while (j < 20) {
        iv |= ((lonb >> j) & 1L) << (2 * j + 1)
        iv |= ((latb >> j) & 1L) << (2 * j)
        j += 1
      }
      val closed = (0 until 8).map(c => GeoHash.Alphabet.charAt(((iv >> (35 - 5 * c)) & 31).toInt)).mkString
      assert(GeoHash.encode(lon, lat, 8) == closed, s"($lon,$lat)")
    }
  }

  test("envelope hashing: derived precision is the smallest containing cell") {
    // a point gets full 20-char precision
    assert(GeoHash.encodeEnvelope(10.40744, 57.64911, 10.40744, 57.64911, 0).length == 20)
    // a small box near the example point: hash must be a prefix of the
    // point hash and its decoded cell must contain the whole box
    val h = GeoHash.encodeEnvelope(10.40, 57.64, 10.41, 57.65, 0)
    assert(h.nonEmpty && "u4pruydqqvj".startsWith(h.take(4)))
    val (x0, y0, x1, y1) = GeoHash.bbox(h)
    assert(x0 <= 10.40 && 10.41 <= x1 && y0 <= 57.64 && 57.65 <= y1)
    // the parent cell (one char shorter) is not minimal-by-construction
    // only when corners diverge at h.length — containment is what's promised
    // a hemisphere-spanning box shares no prefix -> empty hash
    assert(GeoHash.encodeEnvelope(-100, -50, 100, 50, 0) == "")
    // explicit maxchars overrides derivation
    assert(GeoHash.encodeEnvelope(10.40, 57.64, 10.41, 57.65, 6).length == 6)
  }

  test("invalid input fails loudly") {
    intercept[IllegalArgumentException](GeoHash.encode(181, 0, 8))
    intercept[IllegalArgumentException](GeoHash.encode(0, -91, 8))
    intercept[IllegalArgumentException](GeoHash.bbox("ab!c"))
    intercept[IllegalArgumentException](GeoHash.bbox("ilo")) // excluded letters
  }

  test("SQL surface: st_geohash / st_geomfromgeohash / st_pointfromgeohash / st_box2dfromgeohash") {
    assert(sql1("st_geohash(10.40744d, 57.64911d, 11)").toString == "u4pruydqqvj")
    assert(sql1("st_geohash(st_point(-5.603d, 42.605d), 5)").toString == "ezs42")
    // geometry default precision: point -> 20 chars
    assert(sql1("length(st_geohash(st_point(-5.603d, 42.605d)))") == 20)
    // decode round-trips through the geometry surface
    assert(sql1("st_astext(st_pointfromgeohash('ezs42'))").toString
      .startsWith("POINT"))
    assert(sql1("st_contains(st_geomfromgeohash('ezs42'), st_pointfromgeohash('ezs42'))") == true)
    assert(sql1("st_geohash(st_pointfromgeohash('u4pruyd'), 7)").toString == "u4pruyd")
    // precision argument truncates before decoding
    assert(sql1("st_astext(st_geomfromgeohash('u4pruydqqvj', 5))") ==
      sql1("st_astext(st_geomfromgeohash('u4pru'))"))
    // box struct agrees with the polygon envelope
    val r = spark.sql(
      """SELECT b.min_x, st_xmin(g) AS gx, b.max_y, st_ymax(g) AS gy
         FROM (SELECT st_box2dfromgeohash('ezs42') AS b, st_geomfromgeohash('ezs42') AS g)""").collect()(0)
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(2) == r.getDouble(3))
    // an envelope geohash of a non-point geometry
    assert(sql1("st_geohash(st_makeenvelope(10.40d, 57.64d, 10.41d, 57.65d))").toString.nonEmpty)
    // empty geometry -> NULL (PostGIS errors; NULL is the Spark-typed analogue)
    assert(sql1("st_geohash(st_geomfromtext('POINT EMPTY'))") == null)
  }
}
