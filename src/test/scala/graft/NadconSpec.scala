package graft

import org.scalatest.funsuite.AnyFunSuite

/** NOAA NADCON .las/.los pair support (geom/Nadcon.scala): write → parse
  * round-trip, exact bilinear interpolation through the shared NTv2 grid
  * model, the east→west column flip, and the +nadgrids= integration. */
class NadconSpec extends AnyFunSuite {

  // 25x21 one-degree grid over east-lon [-110,-86] x lat [30,50]; shift
  // fields bilinear in the EAST column index with binary-fraction
  // coefficients → float32 storage and interpolation both exact
  private def demo: (String, Int, Int) = {
    val nc = 25; val nr = 21
    val la = new Array[Float](nr * nc); val lo = new Array[Float](nr * nc)
    for (r <- 0 until nr; c <- 0 until nc) {
      la(r * nc + c) = (0.5f + 0.25f * c + 0.125f * r + 0.0625f * c * r)
      lo(r * nc + c) = (1.0f + 0.125f * c + 0.25f * r - 0.03125f * c * r)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_nadcon")
    val base = dir.resolve("demo").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".las"),
      graft.geom.Nadcon.writePlane(nc, nr, -110f, 1f, 30f, 1f, la))
    java.nio.file.Files.write(java.nio.file.Paths.get(base + ".los"),
      graft.geom.Nadcon.writePlane(nc, nr, -110f, 1f, 30f, 1f, lo))
    (base, nc, nr)
  }

  test("parsePair: bounds, orientation, and node flip into the NTv2 frame") {
    val (base, nc, nr) = demo
    val g = graft.geom.Nadcon.load(base + ".las")
    assert(g.subGrids.length == 1)
    val sg = g.subGrids.head
    assert(sg.nCols == nc && sg.nRows == nr)
    assert(sg.sLat == 30 * 3600.0 && sg.nLat == 50 * 3600.0)
    assert(sg.eLonW == 86 * 3600.0 && sg.wLonW == 110 * 3600.0)
    // node at east-column c=0 (lon -110, the WESTERNMOST point) must sit at
    // the flipped index nCols-1 in the west-positive frame
    assert(sg.latShiftSec(nc - 1) == 0.5f)
    assert(sg.lonShiftSecW(nc - 1) == 1.0f)
    // east-column c=24 (lon -86) → flipped index 0
    assert(sg.latShiftSec(0) == 0.5f + 0.25f * 24)
  }

  test("forward shift matches the analytic field exactly at off-node points") {
    val (base, _, _) = demo
    val g = graft.geom.Nadcon.load(base)
    for (lon <- Seq(-109.25, -100.5, -87.75); lat <- Seq(30.5, 41.25, 48.75)) {
      val cc = lon + 110.0; val rr = lat - 30.0
      val dLat = 0.5 + 0.25 * cc + 0.125 * rr + 0.0625 * cc * rr
      val dLonW = 1.0 + 0.125 * cc + 0.25 * rr - 0.03125 * cc * rr
      val (flo, fla) = g.forward(lon, lat)
      assert(flo == lon - dLonW / 3600.0, s"lon at ($lon,$lat)")
      assert(fla == lat + dLat / 3600.0, s"lat at ($lon,$lat)")
      // inverse round-trips
      val (ilo, ila) = g.inverse(flo, fla)
      assert(math.abs(ilo - lon) < 1e-11 && math.abs(ila - lat) < 1e-11)
    }
  }

  test("st_transform consumes a .las path through +nadgrids=") {
    val (base, _, _) = demo
    val spark = SparkTestSession.spark
    val r = spark.sql(s"""
      SELECT st_x(st_transform(st_point(-100.25d, 40.5d),
               '+proj=longlat +ellps=clrk66 +nadgrids=$base.las', 'OGC:CRS84')) AS x,
             st_y(st_transform(st_point(-100.25d, 40.5d),
               '+proj=longlat +ellps=clrk66 +nadgrids=$base.las', 'OGC:CRS84')) AS y""")
      .collect()(0)
    val cc = -100.25 + 110.0; val rr = 40.5 - 30.0
    val dLat = 0.5 + 0.25 * cc + 0.125 * rr + 0.0625 * cc * rr
    val dLonW = 1.0 + 0.125 * cc + 0.25 * rr - 0.03125 * cc * rr
    assert(r.getDouble(0) == -100.25 - dLonW / 3600.0)
    assert(r.getDouble(1) == 40.5 + dLat / 3600.0)
  }

  test("malformed input fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nadcon_bad")
    val bad = dir.resolve("bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(bad.toString + ".las"), new Array[Byte](40))
    java.nio.file.Files.write(java.nio.file.Paths.get(bad.toString + ".los"), new Array[Byte](40))
    val e = intercept[IllegalArgumentException](graft.geom.Nadcon.load(bad.toString))
    assert(e.getMessage.contains("truncated"))
  }
}
