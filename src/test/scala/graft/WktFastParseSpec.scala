package graft

import graft.geom.{Geo, Wkt}
import org.scalatest.funsuite.AnyFunSuite

/** POINT/MULTIPOINT WKT fast scanner (round-4 parse-bound tail): must agree
  * with the JTS reader everywhere it engages, and beat it on throughput. */
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
      "POINT EMPTY", "MULTIPOINT EMPTY")
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

  test("malformed input still errors through the general reader") {
    // (JTS tolerates trailing garbage after a complete geometry, so that
    // case is not an error in either path)
    for (bad <- Seq("POINT (1)", "POINT (1 2", "POINT 1 2", "POINT (a b)", "POINT (1 2 3 4)"))
      assertThrows[Exception](Geo.fromWkt(bad))
  }

  test("random round-trip property: write then fast-parse is identity") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextDouble() * 2000 - 1000
      val y = rnd.nextDouble() * 2000 - 1000
      val wkt = rnd.nextInt(3) match {
        case 0 => s"POINT ($x $y)"
        case 1 => s"POINT Z ($x $y ${rnd.nextInt(100)})"
        case 2 => s"MULTIPOINT ($x $y, ${-x} ${-y})"
      }
      assert(Wkt.write(Geo.fromWkt(wkt)) == Wkt.write(jts(wkt)), wkt)
    }
  }

  test("micro-bench: fast path beats the JTS reader on point WKT") {
    val strs = Array.tabulate(100000)(i => s"POINT (${i % 1000} ${(i * 7) % 1000})")
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // warmup both paths
    strs.take(20000).foreach(Geo.fromWkt)
    val r = new org.locationtech.jts.io.WKTReader(Geo.factory)
    strs.take(20000).foreach(r.read)
    val fast = time(() => strs.foreach(Geo.fromWkt))
    val slow = time(() => strs.foreach(r.read))
    info(f"fast=${fast}%.3fs jts=${slow}%.3fs speedup=${slow / fast}%.1fx")
    assert(slow / fast > 1.5, f"speedup only ${slow / fast}%.2fx")
  }
}
