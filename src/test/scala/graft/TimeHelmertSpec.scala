package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Time-dependent reference frames: GDA2020 ↔ ITRF2014(t) via the EPSG:8049
 * rotation rates (the Australian-plate Euler motion), with PROJ's
 * `CODE@epoch` coordinate-epoch spelling. External anchors: GDA2020 is
 * DEFINED as ITRF2014 at epoch 2020.0 (identity), and the Australian plate
 * moves ~6–7 cm/yr toward the NNE in the ITRF (Altamimi et al. 2017 plate
 * motion model; e.g. Alice Springs ≈ 58.5 mm/yr N, 31.9 mm/yr E).
 */
class TimeHelmertSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)
  private def xy(expr: String): (Double, Double) = {
    val r = spark.sql(s"SELECT st_x(g), st_y(g) FROM (SELECT $expr AS g)").collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("GDA2020 = ITRF2014 at the definition epoch 2020.0 (published identity)") {
    val (x, y) = xy("st_transform(st_point(133.885d, -23.67d), 'EPSG:7844', 'EPSG:9000@2020.0', true)")
    assert(math.abs(x - 133.885) < 1e-10 && math.abs(y - -23.67) < 1e-10)
    // without an epoch the shift evaluates at t0 — also identity
    val (x2, y2) = xy("st_transform(st_point(133.885d, -23.67d), 'EPSG:7844', 'EPSG:4326', true)")
    assert(math.abs(x2 - 133.885) < 1e-10 && math.abs(y2 - -23.67) < 1e-10)
  }

  test("plate motion magnitude and azimuth match the published AUS velocity") {
    // Alice Springs, 10 years after the definition epoch: expect ~0.59 m N,
    // ~0.32 m E (58.5/31.9 mm/yr), azimuth ~28 deg
    val (lon0, lat0) = (133.885, -23.67)
    val (lon1, lat1) = xy(s"st_transform(st_point(${lon0}d, ${lat0}d), 'EPSG:7844', 'EPSG:9000@2030.0', true)")
    val mPerDegLat = 111132.0
    val mPerDegLon = 111320.0 * math.cos(math.toRadians(lat0))
    val dn = (lat1 - lat0) * mPerDegLat
    val de = (lon1 - lon0) * mPerDegLon
    val speed = math.hypot(dn, de) / 10.0 // m/yr
    val az = math.toDegrees(math.atan2(de, dn))
    assert(speed > 0.055 && speed < 0.075, s"plate speed $speed m/yr outside 5.5-7.5 cm/yr")
    assert(az > 20 && az < 37, s"azimuth $az outside NNE window")
  }

  test("epoch rides the operation whichever side carries the tag") {
    // ITRF2014@2030 -> GDA2020 must use the 2030 evaluation even though the
    // time-dependent datum is on the TARGET side
    val (lon1, lat1) = xy("st_transform(st_point(133.885d, -23.67d), 'EPSG:9000@2030.0', 'EPSG:7844', true)")
    assert(math.abs(lat1 - -23.67) * 111132.0 > 0.3, "target-side epoch was ignored")
    // and it must be the exact inverse of the forward direction
    val (lonF, latF) = xy("st_transform(st_point(133.885d, -23.67d), 'EPSG:7844', 'EPSG:9000@2030.0', true)")
    val (lonB, latB) = xy(s"st_transform(st_point(${lonF}d, ${latF}d), 'EPSG:9000@2030.0', 'EPSG:7844', true)")
    assert(math.abs(lonB - 133.885) < 1e-9 && math.abs(latB - -23.67) < 1e-9)
  }

  test("projected MGA2020 zones carry the same dynamic datum") {
    // Sydney in MGA zone 56 (EPSG:7856): ITRF coordinates drift ~0.57 m over
    // 10 years; the grid coordinates of a plate-fixed point must NOT change
    // when no epoch is given
    val (e0, n0) = xy("st_transform(st_point(151.21d, -33.87d), 'EPSG:7844', 'EPSG:7856', true)")
    val (e1, n1) = xy("st_transform(st_point(151.21d, -33.87d), 'EPSG:9000@2030.0', 'EPSG:7856', true)")
    val d = math.hypot(e1 - e0, n1 - n0)
    assert(d > 0.40 && d < 0.75, s"epoch-tagged MGA2020 displacement $d outside window")
    val (e2, n2) = xy("st_transform(st_point(151.21d, -33.87d), 'EPSG:4326', 'EPSG:7856', true)")
    assert(math.abs(e2 - e0) < 1e-6 && math.abs(n2 - n0) < 1e-6)
  }

  test("static datums ignore the coordinate epoch (PROJ semantics)") {
    val (x0, y0) = xy("st_transform(st_point(-0.13d, 51.5d), 'EPSG:4326', 'EPSG:27700', true)")
    val (x1, y1) = xy("st_transform(st_point(-0.13d, 51.5d), 'EPSG:4326@2030.0', 'EPSG:27700', true)")
    assert(x0 == x1 && y0 == y1)
  }

  test("malformed or out-of-range epochs fail loudly") {
    val e1 = intercept[Exception](sql1(
      "st_transform(st_point(1.0d, 2.0d), 'EPSG:9000@1111.0', 'EPSG:7844', true)"))
    assert(e1.getMessage.contains("epoch"))
    val e2 = intercept[Exception](sql1(
      "st_transform(st_point(1.0d, 2.0d), 'EPSG:9000@banana', 'EPSG:7844', true)"))
    assert(e2.getMessage != null)
  }

  test("'@' in proj-string grid names is not an epoch (+nadgrids=@null)") {
    // Proj.describe itself emits '+nadgrids=@null' for EPSG:3857, and '@path'
    // is the optional-grid spelling — neither is a CODE@epoch tag
    val merc = "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 " +
      "+x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +no_defs"
    val (x, y) = xy(s"st_transform(st_point(10.0d, 50.0d), 'EPSG:4326', '$merc', true)")
    val (xr, yr) = xy("st_transform(st_point(10.0d, 50.0d), 'EPSG:4326', 'EPSG:3857', true)")
    assert(math.abs(x - xr) < 1e-6 && math.abs(y - yr) < 1e-6)
    // and with an epoch-tagged dynamic frame on the other side it still parses
    val (x2, _) = xy(s"st_transform(st_point(133.885d, -23.67d), 'EPSG:9000@2030.0', '$merc', true)")
    assert(x2.isFinite)
  }

  test("mismatched epochs on the two sides are an error (PROJ semantics)") {
    val e = intercept[Exception](sql1(
      "st_transform(st_point(133.885d, -23.67d), 'EPSG:9000@2020.0', 'EPSG:7844@2030.0', true)"))
    assert(e.getMessage.contains("mismatched"), e.getMessage)
    // equal epochs on both sides are fine
    val (x, y) = xy(
      "st_transform(st_point(133.885d, -23.67d), 'EPSG:9000@2020.0', 'EPSG:7844@2020.0', true)")
    assert(math.abs(x - 133.885) < 1e-10 && math.abs(y - -23.67) < 1e-10)
  }

  test("ITRF realizations resolve as hub aliases") {
    for (code <- Seq("EPSG:8999", "EPSG:9000", "EPSG:9990")) {
      val (x, y) = xy(s"st_transform(st_point(10.0d, 50.0d), '$code', 'EPSG:4326', true)")
      assert(math.abs(x - 10.0) < 1e-12 && math.abs(y - 50.0) < 1e-12)
    }
  }
}
