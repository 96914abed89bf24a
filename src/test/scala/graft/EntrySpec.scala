package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver smoke contract: entry() on sf0.001 must return rows. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getLong(1) > 0))   // n
    assert(rows.forall(!_.isNullAt(2)))     // extent wkt
    assert(rows.forall(_.getDouble(3) > 0)) // union area
  }

  test("fixture cache (bench job-floor lever) leaves query results bit-identical") {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    // representative mix: agg over lineitem, window over events, join
    val names = Seq("q_tpch_q1", "q_sessionize", "q_spatial_join")
    def run(): Map[String, Seq[String]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).toSeq
    }.toMap
    val plain = run()
    spark.conf.set("spark.graft.fixtureCache.enabled", "true")
    try {
      val cached = run()
      val again = run() // second pass actually reads the persisted tables
      names.foreach { n =>
        assert(cached(n) == plain(n), s"$n changed under the fixture cache")
        assert(again(n) == plain(n), s"$n changed on the warm cached read")
      }
    } finally spark.conf.set("spark.graft.fixtureCache.enabled", "false")
  }
}
