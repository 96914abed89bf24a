package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteOrder
import graft.geom.{NtV2, Proj}

/** NTv2 grid-shift datum support: binary format round-trip (both byte
  * orders), bilinear interpolation against an analytic bilinear field (for
  * which interpolation is exact), sub-grid selection, inverse convergence,
  * `+nadgrids=` resolution semantics, and end-to-end SQL through
  * st_transform. Reference behavior: PROJ grid datums via proj.db
  * (reference proj/module.cpp:14-47). */
class NtV2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // Synthetic 21x21 1-degree grid over lon [-110,-90] W, lat [30,50]:
  // node values sample a bilinear function of (row, col) with exact binary
  // fractions, so float32 storage AND bilinear interpolation are both exact.
  private def dLat(c: Double, r: Double): Double = 0.5 + 0.25 * c + 0.125 * r + 0.0625 * c * r
  private def dLonW(c: Double, r: Double): Double = 1.0 + 0.125 * c + 0.25 * r - 0.03125 * c * r

  private def mainGrid: NtV2.SubGrid = {
    val nR = 21; val nC = 21
    val la = new Array[Float](nR * nC); val lo = new Array[Float](nR * nC)
    for (r <- 0 until nR; c <- 0 until nC) {
      la(r * nC + c) = dLat(c, r).toFloat
      lo(r * nC + c) = dLonW(c, r).toFloat
    }
    NtV2.SubGrid("MAIN", "NONE", 30 * 3600.0, 50 * 3600.0, 90 * 3600.0, 110 * 3600.0,
      3600.0, 3600.0, nR, nC, la, lo)
  }

  test("gsb write/parse round-trips in both byte orders, bit-exact") {
    val g = NtV2.Grid(Vector(mainGrid), "test")
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val back = NtV2.parse(NtV2.write(g, order), "rt")
      assert(back.subGrids.length == 1)
      val sg = back.subGrids.head
      assert(sg.name == "MAIN" && sg.nRows == 21 && sg.nCols == 21)
      assert(sg.sLat == 30 * 3600.0 && sg.wLonW == 110 * 3600.0)
      assert(sg.latShiftSec.sameElements(mainGrid.latShiftSec))
      assert(sg.lonShiftSecW.sameElements(mainGrid.lonShiftSecW))
    }
  }

  test("bilinear interpolation is exact for a bilinear node field") {
    val g = NtV2.Grid(Vector(mainGrid), "test")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val lon = -110 + rnd.nextDouble() * 20 // east-positive degrees
      val lat = 30 + rnd.nextDouble() * 20
      val c = (-lon) - 90.0; val r = lat - 30.0 // fractional col/row
      val (flo, fla) = g.forward(lon, lat)
      assert(math.abs(fla - (lat + dLat(c, r) / 3600.0)) < 1e-12, s"lat at ($lon,$lat)")
      assert(math.abs(flo - (lon - dLonW(c, r) / 3600.0)) < 1e-12, s"lon at ($lon,$lat)")
    }
    // exact node + corner positions (index clamping at the edges)
    for ((lon, lat) <- Seq((-110.0, 50.0), (-90.0, 30.0), (-100.0, 40.0))) {
      val c = (-lon) - 90.0; val r = lat - 30.0
      val (flo, fla) = g.forward(lon, lat)
      assert(math.abs(fla - (lat + dLat(c, r) / 3600.0)) < 1e-12)
      assert(math.abs(flo - (lon - dLonW(c, r) / 3600.0)) < 1e-12)
    }
  }

  test("inverse is a true inverse of forward") {
    val g = NtV2.Grid(Vector(mainGrid), "test")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val lon = -109 + rnd.nextDouble() * 18
      val lat = 31 + rnd.nextDouble() * 18
      val (flo, fla) = g.forward(lon, lat)
      val (blo, bla) = g.inverse(flo, fla)
      assert(math.abs(blo - lon) < 1e-11 && math.abs(bla - lat) < 1e-11)
    }
  }

  test("densest containing sub-grid wins (parent/child selection)") {
    // child: 0.5-degree cells over lon [-105,-100] W, lat [35,40], constant shifts
    val nR = 11; val nC = 11
    val la = Array.fill(nR * nC)(10.0f); val lo = Array.fill(nR * nC)(20.0f)
    val child = NtV2.SubGrid("CHILD", "MAIN", 35 * 3600.0, 40 * 3600.0,
      100 * 3600.0, 105 * 3600.0, 1800.0, 1800.0, nR, nC, la, lo)
    val g = NtV2.Grid(Vector(mainGrid, child), "test")
    val (flo, fla) = g.forward(-102.0, 37.0) // inside child
    assert(math.abs(fla - (37.0 + 10.0 / 3600.0)) < 1e-12)
    assert(math.abs(flo - (-102.0 - 20.0 / 3600.0)) < 1e-12)
    val c = 15.0; val r = 15.0 // (-105,45) in parent only
    val (plo, pla) = g.forward(-105.0, 45.0)
    assert(math.abs(pla - (45.0 + dLat(c, r) / 3600.0)) < 1e-12)
    assert(math.abs(plo - (-105.0 - dLonW(c, r) / 3600.0)) < 1e-12)
  }

  test("points outside coverage fail loudly, naming the grid") {
    val g = NtV2.Grid(Vector(mainGrid), "mygrid.gsb")
    val e = intercept[IllegalArgumentException](g.forward(0.0, 0.0))
    assert(e.getMessage.contains("outside the NTv2 grid coverage"))
    assert(e.getMessage.contains("mygrid.gsb"))
  }

  test("malformed files fail loudly") {
    val good = NtV2.write(NtV2.Grid(Vector(mainGrid), "t"))
    assert(intercept[IllegalArgumentException](NtV2.parse(Array[Byte](1, 2, 3), "x"))
      .getMessage.contains("truncated"))
    val notNtv2 = good.clone(); notNtv2(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](NtV2.parse(notNtv2, "x"))
      .getMessage.contains("NUM_OREC"))
    val truncated = good.take(good.length - 16)
    assert(intercept[IllegalArgumentException](NtV2.parse(truncated, "x"))
      .getMessage.contains("truncated"))
  }

  private def writeTmp(name: String): String = {
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft_ntv2")).toString
    val p = s"$dir/$name"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      NtV2.write(NtV2.Grid(Vector(mainGrid), name)))
    p
  }

  test("+nadgrids spec: files load and cache; @optional-missing skipped; null sentinel") {
    val p = writeTmp("spec.gsb")
    assert(NtV2.fromNadgridsSpec(p).exists(_.subGrids.nonEmpty))
    assert(NtV2.fromNadgridsSpec(s"@/nonexistent/missing.gsb,$p").exists(_.subGrids.length == 1))
    assert(NtV2.fromNadgridsSpec("null").isEmpty)
    assert(NtV2.fromNadgridsSpec("@/nonexistent/missing.gsb,null").isEmpty)
    val e = intercept[IllegalArgumentException](NtV2.fromNadgridsSpec("/nonexistent/required.gsb"))
    assert(e.getMessage.contains("not found"))
  }

  test("st_transform applies +nadgrids end-to-end (forward and inverse), SQL surface") {
    Graft.register(spark)
    val p = writeTmp("sql.gsb")
    val crs = s"+proj=longlat +ellps=clrk66 +nadgrids=$p"
    val row = spark.sql(
      s"""SELECT st_x(t) AS x, st_y(t) AS y,
                 st_x(b) AS bx, st_y(b) AS by
          FROM (SELECT st_transform(st_point(-100.5d, 40.25d), '$crs', 'OGC:CRS84') AS t,
                       st_transform(st_transform(st_point(-100.5d, 40.25d), '$crs', 'OGC:CRS84'),
                                    'OGC:CRS84', '$crs') AS b)""").head()
    val c = 10.5; val r = 10.25
    assert(math.abs(row.getDouble(1) - (40.25 + dLat(c, r) / 3600.0)) < 1e-12)
    assert(math.abs(row.getDouble(0) - (-100.5 - dLonW(c, r) / 3600.0)) < 1e-12)
    assert(math.abs(row.getDouble(2) - (-100.5)) < 1e-11 && math.abs(row.getDouble(3) - 40.25) < 1e-11)
  }

  test("grid composes with a projected CRS (+proj=tmerc +nadgrids)") {
    Graft.register(spark)
    val p = writeTmp("proj.gsb")
    // NAD27-style: Clarke 1866 TM with the datum carried by the grid
    val src = s"+proj=tmerc +lat_0=0 +lon_0=-99 +k=0.9996 +x_0=500000 +ellps=clrk66 +nadgrids=$p"
    val wgs = Proj.fromProjString(src).get
    // forward to WGS84 then back — full projection+grid round-trip
    val (e0, n0) = wgs.proj.forward(-100.5, 40.25)
    val row = spark.sql(
      s"""SELECT st_x(t) AS x, st_y(t) AS y
          FROM (SELECT st_transform(st_transform(st_point(${e0}d, ${n0}d), '$src', 'OGC:CRS84'),
                                    'OGC:CRS84', '$src') AS t)""").head()
    assert(math.abs(row.getDouble(0) - e0) < 1e-4 && math.abs(row.getDouble(1) - n0) < 1e-4)
  }
}
