package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  test("most recent marker at or before each event, per key") {
    import spark.implicits._
    val events = Seq(("a", 5L), ("a", 10L), ("a", 15L), ("a", 25L), ("a", 35L),
                     ("b", 100L)).toDF("k", "ts")
    val markers = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0))
      .toDF("k", "ts", "v")
    val got = AsofJoin.asof(events, markers, Seq("k"), "ts", "ts", Seq("ts", "v"), "m_")
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq(("a", 5L, -1L), ("a", 10L, 10L), ("a", 15L, 10L),
                      ("a", 25L, 20L), ("a", 35L, 30L), ("b", 100L, -1L)))
  }

  test("parity with a join+max_by formulation on generated data") {
    spark.sql("""
      SELECT id % 7 AS k, (id * 131) % 1000 AS ts, id AS eid
      FROM range(0, 2000)""").createOrReplaceTempView("asof_e")
    spark.sql("""
      SELECT id % 7 AS k, (id * 173) % 1000 AS ts, CAST(id AS DOUBLE) AS v
      FROM range(0, 300)""").createOrReplaceTempView("asof_m")
    // markers must be unique per (k, ts) for a deterministic answer
    spark.sql("""
      SELECT k, ts, max(v) AS v FROM asof_m GROUP BY k, ts
    """).createOrReplaceTempView("asof_mu")

    val fast = AsofJoin.asof(
      spark.table("asof_e"), spark.table("asof_mu"),
      Seq("k"), "ts", "ts", Seq("v"), "m_")
      .selectExpr("eid", "m_v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap

    val naive = spark.sql("""
      SELECT e.eid, max_by(m.v, m.ts) AS v
      FROM asof_e e JOIN asof_mu m ON e.k = m.k AND m.ts <= e.ts
      GROUP BY e.eid""").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

    assert(fast.size == 2000)
    naive.foreach { case (eid, v) =>
      assert(fast(eid) == v, s"eid=$eid fast=${fast(eid)} naive=$v")
    }
    // rows absent from the naive inner join must be NULL in the asof result
    fast.foreach { case (eid, v) =>
      if (!naive.contains(eid)) assert(v.isNaN, s"eid=$eid expected no match")
    }
  }

  test("NULL right ts / NULL keys never match, per SQL asof semantics") {
    import spark.implicits._
    val events = Seq(("a", 10L), (null.asInstanceOf[String], 10L)).toDF("k", "ts")
    val markers = Seq[(String, java.lang.Long, Double)](
      ("a", null, 1.0),                   // null ts: visible to nobody
      (null, java.lang.Long.valueOf(5L), 2.0), // null key: matches no '=' key
      ("a", java.lang.Long.valueOf(7L), 3.0)   // the only legitimate marker
    ).toDF("k", "ts", "v")
    val got = AsofJoin.asof(events, markers, Seq("k"), "ts", "ts", Seq("v"), "m_")
      .orderBy("k")
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq
    val byKey = got.toMap
    assert(byKey("a") == 3.0, s"event 'a' must see only the ts=7 marker: $got")
    assert(byKey("<null>").isNaN, s"NULL-key event must match nothing: $got")
  }

  test("single shuffle: plan contains exactly one Exchange for the window") {
    import spark.implicits._
    val e = Seq(("a", 1L)).toDF("k", "ts")
    val m = Seq(("a", 1L, 1.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.asof(e, m, Seq("k"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
  }
}
