package graft

import graft.operators.SemDeDup
import org.scalatest.funsuite.AnyFunSuite

class SemDeDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val cents = Seq(
    0 -> Array(1.0, 0.0, 0.0),
    1 -> Array(0.0, 1.0, 0.0))

  test("upper-triangular rule: earlier survivor, later near-dups drop") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0, 0.01, 0.0)),  // cluster 0, earliest — survives
      (2L, Array(1.0, 0.012, 0.0)), // ~identical to 1 — drops
      (3L, Array(0.9, 0.4, 0.0)),   // cluster 0 but dissimilar — survives
      (10L, Array(0.0, 1.0, 0.1)),  // cluster 1, earliest — survives
      (11L, Array(0.0, 1.0, 0.1))   // exact dup — drops
    ).toDF("id", "vec")
    val got = SemDeDup.dedup(emb, "id", "vec", cents, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 0), (3L, 0), (10L, 1)), got.toString)
  }

  test("skewed mega-cluster stays bounded: sub-cells cap the pairwise join") {
    import spark.implicits._
    // 500 identical vectors all land in cluster 0 — unbounded SemDeDup would
    // compare 500*499/2 pairs in ONE cell; with maxClusterSize=50 the plan
    // must split into ceil(500/50)=10 hash cells
    val emb = spark.range(500).selectExpr("id", "array(1.0d, 0.0d, 0.0d) AS vec")
    val result = SemDeDup.dedup(emb, "id", "vec", cents, tau = 0.99, maxClusterSize = 50)
    // the pairwise join must key on the sub-cell, not just the cluster
    val plan = result.queryExecution.optimizedPlan.toString
    assert(plan.contains("__sem_sub"), s"pair join not sub-cell keyed:\n$plan")
    val survivors = result.collect().map(_.getLong(0)).sorted
    // identical vectors: exactly one survivor per sub-cell (the earliest id
    // in that cell) — bounded recall loss vs the single global survivor,
    // never more than the number of cells
    assert(survivors.length >= 1 && survivors.length <= 10,
      s"${survivors.length} survivors — cap not effective")
    // determinism: same input, same survivors
    val again = SemDeDup.dedup(emb, "id", "vec", cents, tau = 0.99, maxClusterSize = 50)
      .collect().map(_.getLong(0)).sorted
    assert(survivors.sameElements(again))
  }

  test("under the cap, results equal the uncapped rule") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0 until 80).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0)
      (i.toLong, base.map(_ + rnd.nextDouble() * 0.3))
    }.toDF("id", "vec")
    val capped = SemDeDup.dedup(emb, "id", "vec", cents, tau = 0.995, maxClusterSize = 4096)
      .collect().map(_.getLong(0)).toSet
    val tiny = SemDeDup.dedup(emb, "id", "vec", cents, tau = 0.995, maxClusterSize = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(capped == tiny, "caps above the cluster size must not change results")
    assert(capped.nonEmpty && capped.size < 80)
  }
}
