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
}
