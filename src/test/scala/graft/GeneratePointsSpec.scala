package graft

import graft.functions.{GeneratePoints, Pcg32}
import org.scalatest.funsuite.AnyFunSuite

class GeneratePointsSpec extends AnyFunSuite {

  test("skip-ahead matches sequential pcg32 stream") {
    var state = Pcg32.seedState(42)
    for (i <- 0L until 500L) {
      val x = Pcg32.nextDouble(state, 0, 100); state = Pcg32.advance(state, 1)
      val y = Pcg32.nextDouble(state, 0, 100); state = Pcg32.advance(state, 1)
      val (px, py) = GeneratePoints.pointAt(42, i, 0, 0, 100, 100)
      assert(px == x && py == y, s"divergence at point $i")
    }
  }

  test("reference benchmark pin: 10M points seed 1337 -> 3986 within envelope") {
    // /root/reference/benchmark/rtree_points_noindex.benchmark pins this count.
    val spark = SparkTestSession.spark
    val n = spark.sql("""
      SELECT count(*) FROM (
        SELECT st_generatepoint(1337L, id, 0.0d, 0.0d, 10000.0d, 10000.0d) AS pt
        FROM range(10000000))
      WHERE st_within(pt, st_makeenvelope(450.0d, 450.0d, 650.0d, 650.0d))""")
      .collect()(0).getLong(0)
    assert(n == 3986L, s"expected the reference pin 3986, got $n")
  }
}
