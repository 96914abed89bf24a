package graft.functions

import graft.geom.Wkb
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Seeded uniform point generator with exact reference parity
 * (/root/reference/spatial/src/spatial/core/functions/table/st_generatepoints.cpp:20-101,
 * which draws x,y per point from DuckDB's pcg32 RandomEngine).
 *
 * PCG32 (XSH-RR 64/32, public algorithm, pcg-random.org) with the
 * pcg_random.hpp one-arg seeding: inc = 1442695040888963407,
 * state0 = (seed + inc) * MULT + inc. Verified against the reference's pinned
 * benchmark: 10M points, seed 1337, bbox [0,10000]², count within
 * envelope(450,450,650,650) = 3986 (benchmark/rtree_points_noindex.benchmark).
 *
 * Unlike the reference's sequential table function, point i is computed
 * directly via O(log i) LCG skip-ahead — so generation distributes over the
 * cluster (spark.range → per-row independent evaluation) yet yields the
 * byte-identical sequence.
 */
object Pcg32 {
  final val Mult = 6364136223846793005L
  final val Inc = 1442695040888963407L

  def seedState(seed: Long): Long = (seed + Inc) * Mult + Inc

  /** state after `delta` advances (standard PCG advance: O(log delta)). */
  def advance(state: Long, delta0: Long): Long = {
    var accMult = 1L; var accPlus = 0L
    var curMult = Mult; var curPlus = Inc
    var delta = delta0
    while (delta != 0) {
      if ((delta & 1L) != 0) {
        accMult *= curMult
        accPlus = accPlus * curMult + curPlus
      }
      curPlus = (curMult + 1) * curPlus
      curMult *= curMult
      delta >>>= 1
    }
    accMult * state + accPlus
  }

  /** XSH-RR output of the given state (the value pcg32 emits as it leaves this state). */
  def output(state: Long): Int = {
    val xorshifted = (((state >>> 18) ^ state) >>> 27).toInt
    val rot = (state >>> 59).toInt
    Integer.rotateRight(xorshifted, rot)
  }

  /** uniform double in [min, max) like RandomEngine::NextRandom32. */
  def nextDouble(state: Long, min: Double, max: Double): Double =
    min + ((output(state).toLong & 0xffffffffL).toDouble / 4294967296.0) * (max - min)
}

object GeneratePoints {

  /** The i-th point of the reference sequence for `seed` within the bbox. */
  def pointAt(seed: Long, i: Long, minX: Double, minY: Double, maxX: Double, maxY: Double): (Double, Double) = {
    val s0 = Pcg32.advance(Pcg32.seedState(seed), 2 * i)
    val s1 = Pcg32.advance(s0, 1)
    (Pcg32.nextDouble(s0, minX, maxX), Pcg32.nextDouble(s1, minY, maxY))
  }

  /** DataFrame of `count` seeded points — distributed, reference-identical. */
  def df(spark: SparkSession, minX: Double, minY: Double, maxX: Double, maxY: Double,
         count: Long, seed: Long): DataFrame = {
    graft.Graft.register(spark)
    spark.range(count).selectExpr(
      s"st_generatepoint($seed, id, ${minX}d, ${minY}d, ${maxX}d, ${maxY}d) AS point")
  }

  private[functions] def load(): Unit = {
    import org.apache.spark.sql.types._
    FnRegistry.add(FnSpec("st_generatepoint",
      Map(6 -> Seq(LongType, LongType, DoubleType, DoubleType, DoubleType, DoubleType)),
      BinaryType,
      _ => { a =>
        val (x, y) = pointAt(a(0).asInstanceOf[Long], a(1).asInstanceOf[Long],
          a(2).asInstanceOf[Double], a(3).asInstanceOf[Double],
          a(4).asInstanceOf[Double], a(5).asInstanceOf[Double])
        Wkb.writePointXY(x, y)
      }))
  }
}
