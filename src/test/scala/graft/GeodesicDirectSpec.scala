package graft

import graft.geom.{Geodesic, GeodesicCalc}
import org.scalatest.funsuite.AnyFunSuite

/** Direct problem + azimuth-returning inverse (round 8, the pair behind
  * `+proj=aeqd`). Pins are analytic: the equator and the meridians are
  * geodesics with closed-form arc lengths, so travelling due east from the
  * equator or due north from anywhere has an exact expected endpoint. The
  * general case is verified by consistency: direct∘inverseFull is the
  * identity on positions, and inverseFull's distance equals the
  * independently-validated distance-only solver (GeodesicSpec's goldens).
  */
class GeodesicDirectSpec extends AnyFunSuite {

  private val g = Geodesic.Wgs84
  private val A = 6378137.0
  private val Mq = 10001965.7293 // WGS84 meridian quadrant, m (published)

  test("due north from the equator by a quarter meridian reaches the pole") {
    val (lat2, _, _) = g.direct(0, 12.5, 0, Mq)
    assert(math.abs(lat2 - 90) < 1e-7, s"lat2=$lat2")
    // half the quadrant lands at the latitude whose meridian arc is Mq/2 —
    // cross-checked against the distance solver, not the same code path
    val (latH, lonH, aziH) = g.direct(0, 12.5, 0, Mq / 2)
    assert(math.abs(lonH - 12.5) < 1e-9 && math.abs(aziH) < 1e-9)
    assert(math.abs(Geodesic.inverse(0, 12.5, latH, 12.5) - Mq / 2) < 1e-6)
  }

  test("due east along the equator is exactly a*dLambda") {
    val s = A * math.toRadians(57.0)
    val (lat2, lon2, azi2) = g.direct(0, 10, 90, s)
    assert(math.abs(lat2) < 1e-9, s"lat2=$lat2")
    assert(math.abs(lon2 - 67) < 1e-9, s"lon2=$lon2")
    assert(math.abs(azi2 - 90) < 1e-9, s"azi2=$azi2")
    val (lat3, lon3, azi3) = g.direct(0, 10, -90, s) // due west
    assert(math.abs(lat3) < 1e-9 && math.abs(lon3 + 47) < 1e-9 && math.abs(azi3 + 90) < 1e-9)
  }

  test("inverseFull: cardinal directions carry the expected azimuths") {
    val (sN, aziN, aziN2) = g.inverseFull(10, 20, 40, 20)
    assert(math.abs(aziN) < 1e-9 && math.abs(aziN2) < 1e-9)
    assert(math.abs(sN - Geodesic.inverse(10, 20, 40, 20)) < 1e-9)
    val (_, aziS, _) = g.inverseFull(40, 20, 10, 20)
    assert(math.abs(math.abs(aziS) - 180) < 1e-9)
    val (sE, aziE, _) = g.inverseFull(0, 0, 0, 30)
    assert(math.abs(aziE - 90) < 1e-9 && math.abs(sE - A * math.toRadians(30)) < 1e-9)
    val (_, aziW, _) = g.inverseFull(0, 0, 0, -30)
    assert(math.abs(aziW + 90) < 1e-9)
    // NE-quadrant sanity on all four sign combinations of the target
    for ((la, lo, lowA, hiA) <- Seq((30.0, 40.0, 0.0, 90.0), (30.0, -40.0, -90.0, 0.0),
                                    (-30.0, 40.0, 90.0, 180.0), (-30.0, -40.0, -180.0, -90.0))) {
      val (_, azi, _) = g.inverseFull(0, 0, la, lo)
      assert(azi >= lowA && azi <= hiA, s"target ($la,$lo) azi=$azi")
    }
  }

  test("direct and inverseFull are mutually consistent (randomized)") {
    val rnd = new scala.util.Random(20260814)
    var i = 0
    while (i < 400) {
      val lat1 = rnd.nextDouble() * 160 - 80
      val lon1 = rnd.nextDouble() * 360 - 180
      val azi1 = rnd.nextDouble() * 360 - 180
      val s12 = 1.0 + rnd.nextDouble() * 1.8e7 // up to 18,000 km: short of the cut locus
      val (lat2, lon2, azi2) = g.direct(lat1, lon1, azi1, s12)
      assert(lat2 >= -90.001 && lat2 <= 90.001, s"lat2=$lat2")
      // the direct endpoint's distance matches the independent inverse solver
      val sBack = Geodesic.inverse(lat1, lon1, lat2, lon2)
      assert(math.abs(sBack - s12) < 2e-3, s"#$i ($lat1,$lon1) azi=$azi1 s=$s12 -> sBack=$sBack")
      // inverseFull recovers the launch azimuth; its direct replay lands on p2
      val (sF, a1, a2) = g.inverseFull(lat1, lon1, lat2, lon2)
      assert(math.abs(sF - s12) < 2e-3, s"#$i sF=$sF s12=$s12")
      val (rLat, rLon, _) = g.direct(lat1, lon1, a1, sF)
      val posErr = Geodesic.inverse(lat2, lon2, rLat, rLon)
      assert(posErr < 5e-3, s"#$i replay err $posErr m (azi1=$azi1 a1=$a1)")
      // forward azimuth at p2 agrees between the two problems away from poles
      if (math.abs(lat2) < 85) {
        val dAzi = math.abs(math.IEEEremainder(azi2 - a2, 360.0))
        assert(dAzi < 1e-4, s"#$i azi2=$azi2 a2=$a2")
      }
      i += 1
    }
  }

  test("non-WGS84 ellipsoids: sphere degenerates to great circles") {
    val r = 6371000.0
    val sph = Geodesic.forEllipsoid(r, 1e15) // f -> 0
    // great-circle distance by the spherical law of cosines
    def gc(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
      val dl = math.toRadians(lon2 - lon1)
      r * math.acos(math.min(1, math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(dl)))
    }
    for ((a, b, c, d) <- Seq((10.0, 20.0, 45.0, 80.0), (-30.0, 5.0, 60.0, -120.0)))
      assert(math.abs(sph.inverseFull(a, b, c, d)._1 - gc(a, b, c, d)) < 1e-3)
    // Bessel 1841 meridian quadrant (analytic elliptic integral value):
    // a=6377397.155, 1/f=299.1528128 -> quadrant 10000855.76 m (published)
    val bessel = Geodesic.forEllipsoid(6377397.155, 299.1528128)
    assert(math.abs(bessel.inverseFull(0, 0, 90, 0)._1 - 10000855.76) < 0.5)
  }
}
