package graft

import graft.geom.Geodesic
import org.scalatest.funsuite.AnyFunSuite

/** Karney geodesic inverse (round-4 replacement for Vincenty). Goldens are
  * published values: the WGS84 quarter meridian, exact equatorial arcs, and
  * the worked examples from Karney 2013 (Tables 2-3) — including the
  * near-antipodal pair Vincenty cannot converge on. */
class GeodesicSpec extends AnyFunSuite {

  private val Mq = 10001965.7293 // WGS84 meridian quadrant, m (published)

  test("meridian quadrant and pole-to-pole") {
    assert(math.abs(Geodesic.inverse(0, 0, 90, 0) - Mq) < 1e-3)
    assert(math.abs(Geodesic.inverse(90, 0, -90, 0) - 2 * Mq) < 2e-3)
    assert(math.abs(Geodesic.inverse(0, 12.3, 45, 12.3) -
      (Geodesic.inverse(0, 0, 90, 0) - Geodesic.inverse(45, 0, 90, 0))) < 1e-6)
  }

  test("equatorial arcs are exact a*lambda up to the (1-f)*180 lift-off") {
    assert(math.abs(Geodesic.inverse(0, 10, 0, 100) - 6378137.0 * math.toRadians(90)) < 1e-6)
    assert(math.abs(Geodesic.inverse(0, 0, 0, 179) - 6378137.0 * math.toRadians(179)) < 1e-6)
    // antipodal equatorial pair: over the pole, exactly two quadrants
    assert(math.abs(Geodesic.inverse(0, 0, 0, 180) - 2 * Mq) < 2e-3)
  }

  test("Karney 2013 Table 2 short line") {
    val d = Geodesic.inverse(-30.12345, 0, -30.12344, 0.00005)
    assert(math.abs(d - 4.944208) < 1e-5, s"short line $d")
  }

  test("Karney 2013 near-antipodal example (Vincenty non-convergent)") {
    val d = Geodesic.inverse(-30.0, 0, 29.9, 179.8)
    assert(math.abs(d - 19989832.827610) < 1e-2, s"antipodal $d")
  }

  test("near-antipodal pairs converge and vary continuously") {
    val d1 = Geodesic.inverse(0.5, 0, -0.4, 179.9)
    assert(d1 > 19.9e6 && d1 < 2 * Mq + 1e4, s"d1=$d1")
    // approaching the exact antipode from different longitudes stays smooth
    val d2 = Geodesic.inverse(0.5, 0, -0.5, 179.99)
    val d3 = Geodesic.inverse(0.5, 0, -0.5, 180.0)
    assert(math.abs(d2 - d3) < 5e3, s"d2=$d2 d3=$d3")
  }

  test("agrees with Vincenty to sub-millimeter on ordinary lines") {
    val pairs = Seq(
      (34.05, -118.24, 40.71, -74.0),   // LA - NYC
      (51.5, -0.13, 35.68, 139.69),     // London - Tokyo
      (-33.87, 151.21, 48.85, 2.35),    // Sydney - Paris
      (1.35, 103.99, 52.31, 4.76),      // SIN - AMS
      (-54.8, -68.3, 69.65, 18.96),     // Ushuaia - Tromsø
      (10.0, 10.0, 10.001, 10.001))     // short line
    pairs.foreach { case (a, b, c, d) =>
      val k = Geodesic.inverse(a, b, c, d)
      val v = graft.functions.GeoFns.vincenty(a, b, c, d)
      assert(math.abs(k - v) < 1e-3, s"($a,$b)->($c,$d): karney=$k vincenty=$v")
    }
  }

  test("st_distance_spheroid reaches the Karney fallback for near-antipodal pairs") {
    val spark = SparkTestSession.spark
    val d = spark.sql(
      "SELECT st_distance_spheroid(st_point(-30.0d, 0.0d), st_point(29.9d, 179.8d))")
      .collect()(0).getDouble(0)
    assert(math.abs(d - 19989832.827610) < 1e-2, s"sql spheroid distance $d")
  }

  test("symmetry and zero") {
    assert(Geodesic.inverse(12, 34, 12, 34) == 0.0)
    val ab = Geodesic.inverse(10, 20, -40, 170)
    val ba = Geodesic.inverse(-40, 170, 10, 20)
    assert(math.abs(ab - ba) < 1e-6)
  }
}
