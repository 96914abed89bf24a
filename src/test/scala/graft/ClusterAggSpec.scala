package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table-scale cluster aggregates (PostGIS ST_ClusterIntersecting /
 *  ST_ClusterWithin aggregate forms): transitive closure over grouped rows,
 *  deterministic output regardless of partition arrival order. */
class ClusterAggSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def rows(q: String): Array[org.apache.spark.sql.Row] = spark.sql(q).collect()

  test("st_clusterwithin_agg forms gaps-and-islands over collinear points") {
    // x in {0, 3, 4, 20, 24, 100}: within 5 → {0,3,4}, {20,24}, {100}
    spark.sql("SELECT explode(array(0, 3, 4, 20, 24, 100)) AS x")
      .createOrReplaceTempView("caw_pts")
    val r = rows("""
      SELECT pos, st_ngeometries(c) AS n, st_xmin(c) AS x0, st_xmax(c) AS x1
      FROM (SELECT st_clusterwithin_agg(st_point(cast(x AS DOUBLE), 0.0d), 5.0d) AS cl
            FROM caw_pts)
      LATERAL VIEW posexplode(cl) t AS pos, c
      ORDER BY pos""")
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getDouble(2), x.getDouble(3))).toSeq ==
      Seq((0, 3, 0.0, 4.0), (1, 2, 20.0, 24.0), (2, 1, 100.0, 100.0)))
  }

  test("st_clusterintersecting_agg merges touching envelopes, keeps gaps apart") {
    // [0,4] [4,8] touch → one cluster; [13,17] is 5 away → its own
    spark.sql("SELECT explode(array(0, 4, 13)) AS x").createOrReplaceTempView("cai_env")
    val r = rows("""
      SELECT pos, st_ngeometries(c) AS n
      FROM (SELECT st_clusterintersecting_agg(
              st_makeenvelope(cast(x AS DOUBLE), 0.0d, cast(x + 4 AS DOUBLE), 1.0d)) AS cl
            FROM cai_env)
      LATERAL VIEW posexplode(cl) t AS pos, c
      ORDER BY pos""")
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toSeq == Seq((0, 2), (1, 1)))
  }

  test("grouped aggregation keeps clusters per group and survives repartition") {
    // identical member multiset under different partitionings → identical result
    val base = spark.sql("""
      SELECT id % 3 AS grp, cast((id * 37) % 50 AS DOUBLE) AS x
      FROM range(0, 300)""")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Int, Double)] = {
      df.createOrReplaceTempView("cag_src")
      rows("""
        SELECT grp, pos, st_ngeometries(c) AS n, st_xmin(c) AS x0
        FROM (SELECT grp, st_clusterwithin_agg(st_point(x, 0.0d), 2.0d) AS cl
              FROM cag_src GROUP BY grp)
        LATERAL VIEW posexplode(cl) t AS pos, c
        ORDER BY grp, pos""").map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    }
    val a = run(base.repartition(1))
    val b = run(base.repartition(13))
    assert(a.nonEmpty && a == b)
  }

  test("aggregate partition equals the collection function's on random members") {
    // seeded random mixed geometries: the aggregate's distinct-only closure
    // + count expansion must reproduce st_clusterwithin(st_collect(...))
    val rnd = new scala.util.Random(20260815)
    val wkts = Seq.fill(120) {
      val x = rnd.nextInt(60); val y = rnd.nextInt(60)
      rnd.nextInt(3) match {
        case 0 => s"POINT ($x $y)"
        case 1 => s"LINESTRING ($x $y, ${x + 2} ${y + 1})"
        case _ => s"POLYGON (($x $y, ${x + 3} $y, ${x + 3} ${y + 3}, $x $y))"
      }
    } ++ Seq.fill(40)("POINT (7 7)") // heavy duplicates exercise the multiset buffer
    spark.createDataFrame(wkts.map(Tuple1(_))).toDF("wkt").createOrReplaceTempView("cap_src")
    for (d <- Seq(0.0, 1.5, 4.0)) {
      val agg = rows(s"""
        SELECT pos, st_ngeometries(c) AS n, st_xmin(c) AS x0, st_ymin(c) AS y0
        FROM (SELECT ${if (d == 0.0) "st_clusterintersecting_agg(st_geomfromtext(wkt))"
                      else s"st_clusterwithin_agg(st_geomfromtext(wkt), ${d}d)"} AS cl
              FROM cap_src)
        LATERAL VIEW posexplode(cl) t AS pos, c ORDER BY pos""")
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq
      val coll = rows(s"""
        SELECT cast(i - 1 AS INT) AS pos,
               st_ngeometries(st_geometryn(cl, cast(i AS INT))) AS n,
               st_xmin(st_geometryn(cl, cast(i AS INT))) AS x0,
               st_ymin(st_geometryn(cl, cast(i AS INT))) AS y0
        FROM (SELECT ${if (d == 0.0) "st_clusterintersecting(g)" else s"st_clusterwithin(g, ${d}d)"} AS cl
              FROM (SELECT st_collect(collect_list(st_geomfromtext(wkt))) AS g FROM cap_src))
        LATERAL VIEW explode(sequence(1, st_ngeometries(cl))) t AS i ORDER BY pos""")
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq
      // same partition: same cluster count, and per-cluster (size, min x/y)
      // multisets agree (member order differs — the aggregate sorts
      // canonically, the collection function keeps arrival order)
      assert(agg.map(_._1) == coll.map(_._1), s"d=$d cluster count")
      assert(agg.map(t => (t._2, t._3, t._4)).sorted == coll.map(t => (t._2, t._3, t._4)).sorted,
        s"d=$d cluster contents")
    }
  }

  test("duplicate and empty members: duplicates counted, empties skipped") {
    val r = rows("""
      SELECT st_ngeometries(cl[0]) AS n, size(cl) AS nc
      FROM (SELECT st_clusterwithin_agg(g, 1.0d) AS cl
            FROM (SELECT explode(array(st_point(0.0d, 0.0d), st_point(0.0d, 0.0d),
                                       st_geomfromtext('POINT EMPTY'))) AS g))""")
    assert(r.head.getInt(0) == 2 && r.head.getInt(1) == 1)
  }
}
