package graft

import graft.geom.{Geo, Wkt}
import org.scalatest.funsuite.AnyFunSuite

/** WKT fast scanner for all non-collection types (round-4 parse-bound tail):
  * must agree with the JTS reader everywhere it engages, and beat it on
  * throughput. */
class WktFastParseSpec extends AnyFunSuite {

  private def jts(s: String) = new org.locationtech.jts.io.WKTReader(Geo.factory).read(s)

  test("agrees with the JTS reader across dimension forms") {
    val cases = Seq(
      "POINT (1 2)", "POINT(3.5 -4.25)", "POINT (1e3 -2.5e-2)",
      "POINT Z (1 2 3)", "POINT M (1 2 4)", "POINT ZM (1 2 3 4)",
      "POINT (1 2 3)",
      "  POINT  ( 7   8 ) ",
      "MULTIPOINT (1 2, 3 4)", "MULTIPOINT ((1 2), (3 4))",
      "MULTIPOINT Z (1 2 3, 4 5 6)", "MULTIPOINT ZM ((1 2 3 4), (5 6 7 8))",
      "MULTIPOINT M (1 2 9)",
      "POINT EMPTY", "MULTIPOINT EMPTY",
      "LINESTRING (0 0, 1 1, 2 0)", "LINESTRING(0.5 -1.5,2 3)",
      "LINESTRING Z (0 0 1, 1 1 2)", "LINESTRING M (0 0 1, 1 1 2)",
      "LINESTRING ZM (0 0 1 2, 1 1 3 4)", "LINESTRING (0 0, 1 1 1)",
      "LINESTRING EMPTY",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "POLYGON Z ((0 0 1, 4 0 1, 4 4 1, 0 0 1))",
      "POLYGON EMPTY",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
      "MULTILINESTRING Z ((0 0 5, 1 1 6))",
      "MULTILINESTRING EMPTY",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))",
      "MULTIPOLYGON ZM (((0 0 1 2, 1 0 1 2, 1 1 1 2, 0 0 1 2)))",
      "MULTIPOLYGON EMPTY",
      " MULTIPOLYGON ( ( ( 0 0 , 1 0 , 1 1 , 0 0 ) ) ) ")
    cases.foreach { s =>
      val fast = Geo.fromWkt(s)
      val ref = jts(s)
      assert(Wkt.write(fast) == Wkt.write(ref), s"'$s': fast=${Wkt.write(fast)} jts=${Wkt.write(ref)}")
    }
    // dimension-tagged empties keep their tags (reference renderer semantics)
    assert(Wkt.write(Geo.fromWkt("POINT Z EMPTY")) == "POINT Z EMPTY")
    assert(Wkt.write(Geo.fromWkt("POINT ZM EMPTY")) == "POINT ZM EMPTY")
    assert(Wkt.write(Geo.fromWkt("MULTIPOINT (EMPTY, 1 2)")) == "MULTIPOINT (EMPTY, 1 2)")
  }

  test("GEOMETRYCOLLECTION agrees with the JTS reader (nesting, tags, EMPTY members)") {
    val cases = Seq(
      "GEOMETRYCOLLECTION (POINT (1 2))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 4))",
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 0)), MULTIPOINT (1 2, 3 4))",
      "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (5 6)), POINT (7 8))",
      "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1))))",
      "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING (0 0, 1 1))",
      "GEOMETRYCOLLECTION (MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0))), GEOMETRYCOLLECTION EMPTY)",
      "GEOMETRYCOLLECTION EMPTY",
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 3), LINESTRING Z (0 0 1, 1 1 2))",
      "GEOMETRYCOLLECTION M (POINT M (1 2 3))",
      "GEOMETRYCOLLECTION ZM (POINT ZM (1 2 3 4))",
      " GEOMETRYCOLLECTION ( POINT ( 1 2 ) , POINT ( 3 4 ) ) ",
      "geometrycollection (point (1 2))")
    cases.foreach { s =>
      val fast = Geo.fromWkt(s)
      val ref = jts(s)
      assert(Wkt.write(fast) == Wkt.write(ref), s"'$s': fast=${Wkt.write(fast)} jts=${Wkt.write(ref)}")
    }
    // malformed collections error in both paths
    for (bad <- Seq("GEOMETRYCOLLECTION (POINT (1 2)", "GEOMETRYCOLLECTION (BOGUS (1 2))",
                    "GEOMETRYCOLLECTION (POINT (1))", "GEOMETRYCOLLECTION ()"))
      assertThrows[Exception](Geo.fromWkt(bad))
  }

  test("malformed input still errors through the general reader") {
    // (JTS tolerates trailing garbage after a complete geometry, so that
    // case is not an error in either path)
    for (bad <- Seq("POINT (1)", "POINT (1 2", "POINT 1 2", "POINT (a b)", "POINT (1 2 3 4)",
                    "LINESTRING (0 0, 1)", "LINESTRING ((0 0, 1 1))", "POLYGON (0 0, 1 1, 2 2, 0 0)",
                    "MULTIPOLYGON ((0 0, 1 0, 1 1, 0 0))"))
      assertThrows[Exception](Geo.fromWkt(bad))
    // ring-validity errors match the JTS reader's exception class and message
    val badRing = "POLYGON ((0 0, 1 0, 1 1, 2 2))"
    val fast = intercept[Exception](Geo.fromWkt(badRing))
    val ref = intercept[Exception](jts(badRing))
    assert(fast.getClass == ref.getClass && fast.getMessage == ref.getMessage, badRing)
    // a closed 3-point ring is accepted by JTS — both paths must agree there too
    assert(Wkt.write(Geo.fromWkt("POLYGON ((0 0, 1 0, 0 0))")) == Wkt.write(jts("POLYGON ((0 0, 1 0, 0 0))")))
  }

  test("random round-trip property: write then fast-parse is identity") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextDouble() * 2000 - 1000
      val y = rnd.nextDouble() * 2000 - 1000
      val wkt = rnd.nextInt(6) match {
        case 0 => s"POINT ($x $y)"
        case 1 => s"POINT Z ($x $y ${rnd.nextInt(100)})"
        case 2 => s"MULTIPOINT ($x $y, ${-x} ${-y})"
        case 3 => s"LINESTRING ($x $y, ${x + 1} ${y + 1}, ${x + 2} $y)"
        case 4 => s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 2}, $x $y))"
        case 5 => s"MULTILINESTRING (($x $y, ${-x} ${-y}), (0 0, 1 ${y.abs}))"
      }
      assert(Wkt.write(Geo.fromWkt(wkt)) == Wkt.write(jts(wkt)), wkt)
    }
  }

  test("micro-bench: fast path beats the JTS reader on point and polygon WKT") {
    val strs = Array.tabulate(100000)(i => s"POINT (${i % 1000} ${(i * 7) % 1000})")
    // best of 3 — a single sample under full-suite parallelism measures GC
    // and sibling-suite contention, not the parser
    def time(f: () => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min
    // warmup both paths
    strs.take(20000).foreach(Geo.fromWkt)
    val r = new org.locationtech.jts.io.WKTReader(Geo.factory)
    strs.take(20000).foreach(r.read)
    // retry the whole comparison: under full-suite parallelism a sibling
    // suite's GC pause can land inside any single measurement window
    def speedup(fastF: () => Unit, slowF: () => Unit): Double =
      (1 to 3).iterator.map { _ => time(slowF) / time(fastF) }.max
    val su = speedup(() => strs.foreach(Geo.fromWkt), () => strs.foreach(r.read))
    info(f"point: speedup=${su}%.1fx")
    assert(su > 1.2, f"point speedup only ${su}%.2fx")

    val polys = Array.tabulate(50000) { i =>
      val x = i % 500; val y = (i * 3) % 500
      s"POLYGON (($x $y, ${x + 4} $y, ${x + 4} ${y + 4}, $x ${y + 4}, $x $y), " +
        s"(${x + 1} ${y + 1}, ${x + 2} ${y + 1}, ${x + 2} ${y + 2}, ${x + 1} ${y + 1}))"
    }
    polys.take(10000).foreach(Geo.fromWkt)
    polys.take(10000).foreach(r.read)
    val suP = speedup(() => polys.foreach(Geo.fromWkt), () => polys.foreach(r.read))
    info(f"polygon: speedup=${suP}%.1fx")
    assert(suP > 1.05, f"polygon speedup only ${suP}%.2fx")
  }
}
