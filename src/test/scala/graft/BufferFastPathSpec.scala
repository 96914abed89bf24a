package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader
import org.locationtech.jts.operation.buffer.{BufferOp, BufferParameters}

/** Byte-parity of the styled-buffer fast paths (closed-form point caps and
 *  the memoized BufferOp path) against a direct JTS BufferOp on the same
 *  inputs. st_buffer must stay indistinguishable from "always run JTS". */
class BufferFastPathSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val reader = new WKTReader()
  private val caps = Seq("CAP_ROUND" -> BufferParameters.CAP_ROUND,
    "CAP_FLAT" -> BufferParameters.CAP_FLAT, "CAP_SQUARE" -> BufferParameters.CAP_SQUARE)
  private val joins = Seq("JOIN_ROUND" -> BufferParameters.JOIN_ROUND,
    "JOIN_MITRE" -> BufferParameters.JOIN_MITRE, "JOIN_BEVEL" -> BufferParameters.JOIN_BEVEL)

  // Compare via WKB -> JTS Geometry -> equalsExact(tolerance 0): bit-exact
  // coordinates AND identical ring start/order. (Comparing rendered WKT would
  // test the writers, not the buffer: JTS toText truncates to ~16 digits
  // while graft's st_astext prints shortest-roundtrip.)
  private def sparkBuffer(wkt: String, d: Double, segs: Int, cap: String, join: String, mitre: Double) = {
    val hex = spark.sql(
      s"SELECT st_ashexwkb(st_buffer(st_geomfromtext('$wkt'), ${d}d, $segs, '$cap', '$join', ${mitre}d))")
      .collect()(0).getString(0)
    new org.locationtech.jts.io.WKBReader().read(
      org.locationtech.jts.io.WKBReader.hexToBytes(hex))
  }

  private def jtsBuffer(wkt: String, d: Double, segs: Int, cap: Int, join: Int, mitre: Double) =
    new BufferOp(reader.read(wkt), new BufferParameters(segs, cap, join, mitre)).getResultGeometry(d)

  test("styled point buffers match JTS exactly for every cap/join/segs/dist combo") {
    for {
      wkt <- Seq("POINT (3 5)", "POINT (-7.25 0.5)", "POINT (1000.125 -2000.875)")
      d <- Seq(0.5, 2.0, 13.75)
      segs <- Seq(2, 8, 16)
      (capN, capI) <- caps
      (joinN, joinI) <- joins
    } assert(sparkBuffer(wkt, d, segs, capN, joinN, 2.0).equalsExact(jtsBuffer(wkt, d, segs, capI, joinI, 2.0)),
      s"$wkt d=$d segs=$segs $capN/$joinN")
  }

  test("zero and negative distance on points fall through to JTS (empty results)") {
    for ((capN, capI) <- caps; d <- Seq(0.0, -1.0))
      assert(sparkBuffer("POINT (3 5)", d, 8, capN, "JOIN_ROUND", 1.0).equalsExact(
        jtsBuffer("POINT (3 5)", d, 8, capI, BufferParameters.JOIN_ROUND, 1.0)))
  }

  test("memoized linestring/polygon styled buffers match JTS, repeated calls included") {
    val geoms = Seq("LINESTRING (0 0, 10 0)", "LINESTRING (2 3, 8 3, 8 7)",
      "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
    for {
      wkt <- geoms
      (capN, capI) <- caps
      (joinN, joinI) <- joins
      mitre <- Seq(1.0, 10.0)
      rep <- 1 to 2 // second pass must hit the memo and return identical bytes
    } assert(sparkBuffer(wkt, 2.0, 8, capN, joinN, mitre).equalsExact(jtsBuffer(wkt, 2.0, 8, capI, joinI, mitre)),
      s"$wkt $capN/$joinN mitre=$mitre rep=$rep")
  }

  test("memo keys distinguish every parameter") {
    // same geometry, one parameter varied each time -> distinct results where
    // JTS produces distinct results (no false cache hits)
    val base = sparkBuffer("LINESTRING (0 0, 10 0)", 2.0, 8, "CAP_FLAT", "JOIN_ROUND", 1.0)
    assert(!sparkBuffer("LINESTRING (0 0, 10 0)", 3.0, 8, "CAP_FLAT", "JOIN_ROUND", 1.0).equalsExact(base))
    assert(!sparkBuffer("LINESTRING (0 0, 10 0)", 2.0, 8, "CAP_SQUARE", "JOIN_ROUND", 1.0).equalsExact(base))
    // 2-arg and 3-arg arities share the memo with sentinel style values and
    // must not collide with styled results
    val hex = spark.sql("SELECT st_ashexwkb(st_buffer(st_geomfromtext('LINESTRING (0 0, 10 0)'), 2.0d, 8))")
      .collect()(0).getString(0)
    val plain = new org.locationtech.jts.io.WKBReader().read(
      org.locationtech.jts.io.WKBReader.hexToBytes(hex))
    assert(plain.equalsExact(BufferOp.bufferOp(reader.read("LINESTRING (0 0, 10 0)"), 2.0, 8)))
    assert(!plain.equalsExact(base))
  }

  test("fused st_area(st_buffer) equals the unfused two-step on every style") {
    // MeasureFusionRule rewrites the fused side; the unfused side is forced
    // through an intermediate column so the rule can't touch it
    def areas(wkt: String, d: Double, segs: Int, cap: String, join: String, mitre: Double) = {
      val fusedRow = spark.sql(
        s"SELECT st_area(st_buffer(st_geomfromtext('$wkt'), ${d}d, $segs, '$cap', '$join', ${mitre}d))").collect()(0)
      val unfused = spark.sql(
        s"""SELECT st_area(b) FROM (
              SELECT st_buffer(st_geomfromtext('$wkt'), ${d}d, $segs, '$cap', '$join', ${mitre}d) AS b)""")
        .collect()(0).getDouble(0)
      (fusedRow.getDouble(0), unfused)
    }
    for {
      wkt <- Seq("POINT (3 5)", "LINESTRING (0 0, 10 0)", "LINESTRING (2 3, 8 3, 8 7)",
        "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")
      (capN, _) <- caps
      (joinN, _) <- joins
      mitre <- Seq(1.0, 10.0)
      rep <- 1 to 2 // second pass = memo hit, must stay identical
    } {
      val (f, u) = areas(wkt, 2.0, 8, capN, joinN, mitre)
      assert(f == u, s"$wkt $capN/$joinN mitre=$mitre rep=$rep fused=$f unfused=$u")
    }
    // 2/3-arg arities fuse too
    for (wkt <- Seq("POINT (3 5)", "LINESTRING (0 0, 10 0)")) {
      val f = spark.sql(s"SELECT st_area(st_buffer(st_geomfromtext('$wkt'), 2.0d, 8))").collect()(0).getDouble(0)
      val u = spark.sql(s"SELECT st_area(b) FROM (SELECT st_buffer(st_geomfromtext('$wkt'), 2.0d, 8) AS b)")
        .collect()(0).getDouble(0)
      assert(f == u, wkt)
    }
    // the rewrite is actually in the plan (non-foldable input so constant
    // folding can't evaluate it away)
    val plan = spark.sql(
      "SELECT st_area(st_buffer(st_point(cast(id AS DOUBLE), 2.0d), 2.0d, 8)) FROM range(3)")
      .queryExecution.optimizedPlan
    assert(plan.expressions.map(_.toString).mkString.contains("st_buffer_area"))
  }
}
