package graft

import graft.operators.KnnJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class KnnJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def pts(view: String, sql: String): Unit = {
    Graft.register(spark)
    spark.sql(sql).createOrReplaceTempView(view)
  }

  test("exact kNN matches brute force, ties resolve by (dist, id)") {
    pts("knn_p", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 7) % 50 AS DOUBLE), CAST((id * 11) % 50 AS DOUBLE))) AS g
      FROM range(0, 300)""")
    pts("knn_b", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 3) % 50 AS DOUBLE), CAST((id * 13) % 50 AS DOUBLE))) AS g
      FROM range(0, 120)""")
    val got = KnnJoin.knn(spark, spark.table("knn_p"), spark.table("knn_b"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap

    // brute force with the same tie rule
    val naive = spark.sql("""
      SELECT pid, nid, d2, rank FROM (
        SELECT p.id AS pid, b.id AS nid,
               (st_x(st_geomfromwkb(p.g)) - st_x(st_geomfromwkb(b.g))) * (st_x(st_geomfromwkb(p.g)) - st_x(st_geomfromwkb(b.g)))
             + (st_y(st_geomfromwkb(p.g)) - st_y(st_geomfromwkb(b.g))) * (st_y(st_geomfromwkb(p.g)) - st_y(st_geomfromwkb(b.g))) AS d2,
               row_number() OVER (PARTITION BY p.id ORDER BY
                 (st_x(st_geomfromwkb(p.g)) - st_x(st_geomfromwkb(b.g))) * (st_x(st_geomfromwkb(p.g)) - st_x(st_geomfromwkb(b.g)))
               + (st_y(st_geomfromwkb(p.g)) - st_y(st_geomfromwkb(b.g))) * (st_y(st_geomfromwkb(p.g)) - st_y(st_geomfromwkb(b.g))), b.id) AS rank
        FROM knn_p p CROSS JOIN knn_b b)
      WHERE rank <= 4""").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), math.sqrt(r.getDouble(2)))).toMap

    assert(got.size == 300 * 4)
    naive.foreach { case (key, (nid, dist)) =>
      val (gn, gd) = got(key)
      assert(gn == nid && math.abs(gd - dist) < 1e-9, s"$key: got=($gn,$gd) want=($nid,$dist)")
    }
  }

  test("empty build geometries are skipped without hanging the search") {
    pts("knn_p3", "SELECT CAST(1 AS BIGINT) AS id, st_aswkb(st_point(0.0d, 0.0d)) AS g")
    pts("knn_b3", """
      SELECT CAST(id AS BIGINT) AS id,
             CASE WHEN id = 0 THEN st_aswkb(st_geomfromtext('POINT EMPTY'))
                  ELSE st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) END AS g
      FROM range(0, 3)""")
    // k=3 > 2 usable items: must return both and terminate
    val rows = KnnJoin.knn(spark, spark.table("knn_p3"), spark.table("knn_b3"), 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(rows == Seq((1L, 1), (2L, 2)))
  }

  test("over-threshold build side auto-dispatches to the tiled path, no driver collect") {
    pts("knn_p4", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 7) % 40 AS DOUBLE), CAST((id * 11) % 40 AS DOUBLE))) AS g
      FROM range(0, 80)""")
    pts("knn_b4", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 3) % 40 AS DOUBLE), CAST((id * 13) % 40 AS DOUBLE))) AS g
      FROM range(0, 200)""")
    val broadcastResult = KnnJoin.knn(spark, spark.table("knn_p4"), spark.table("knn_b4"), 3)
      .orderBy("pid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    val prev = spark.conf.getOption("spark.graft.spatialJoin.broadcastThreshold")
    spark.conf.set("spark.graft.spatialJoin.broadcastThreshold", "64")
    try {
      // with a 64-byte budget this MUST take the distributed path — and
      // produce the identical rows (same (dist, id) tie rule)
      val tiled = KnnJoin.knn(spark, spark.table("knn_p4"), spark.table("knn_b4"), 3)
        .orderBy("pid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
      assert(tiled == broadcastResult)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.spatialJoin.broadcastThreshold", v)
        case None => spark.conf.unset("spark.graft.spatialJoin.broadcastThreshold")
      }
    }
  }

  test("knnTiled matches the broadcast path row for row (ids, ranks, distances)") {
    pts("knn_p5", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 7) % 50 AS DOUBLE), CAST((id * 11) % 50 AS DOUBLE))) AS g
      FROM range(0, 300)""")
    pts("knn_b5", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST((id * 3) % 50 AS DOUBLE), CAST((id * 13) % 50 AS DOUBLE))) AS g
      FROM range(0, 120)""")
    val bc = KnnJoin.knn(spark, spark.table("knn_p5"), spark.table("knn_b5"), 4)
      .orderBy("pid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val ti = KnnJoin.knnTiled(spark, spark.table("knn_p5"), spark.table("knn_b5"), 4)
      .orderBy("pid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(ti.size == 300 * 4)
    assert(ti == bc)
  }

  test("knnTiled: k larger than the build side returns every build row") {
    pts("knn_p6", "SELECT CAST(1 AS BIGINT) AS id, st_aswkb(st_point(0.0d, 0.0d)) AS g")
    pts("knn_b6", """
      SELECT CAST(id AS BIGINT) AS id, st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) AS g
      FROM range(0, 3)""")
    val rows = KnnJoin.knnTiled(spark, spark.table("knn_p6"), spark.table("knn_b6"), 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(rows == Seq((0L, 1), (1L, 2), (2L, 3)))
  }

  test("knnTiled converges when probe and build sets are far apart (radius acceleration)") {
    pts("knn_p7", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST(1000000 + id AS DOUBLE), 1000000.0d)) AS g
      FROM range(0, 5)""")
    pts("knn_b7", """
      SELECT CAST(id AS BIGINT) AS id,
             st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) AS g
      FROM range(0, 10)""")
    val rows = KnnJoin.knnTiled(spark, spark.table("knn_p7"), spark.table("knn_b7"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(rows.length == 10) // 5 probes x k=2
    // every probe's nearest neighbor is build id 9 (largest x), then 8
    assert(rows.filter(_._3 == 1).forall(_._2 == 9L))
    assert(rows.filter(_._3 == 2).forall(_._2 == 8L))
  }

  test("knnTiled skips null/empty geometries like the broadcast path") {
    pts("knn_p8", """
      SELECT CAST(id AS BIGINT) AS id,
             CASE WHEN id = 0 THEN st_aswkb(st_geomfromtext('POINT EMPTY'))
                  ELSE st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) END AS g
      FROM range(0, 3)""")
    pts("knn_b8", """
      SELECT CAST(id AS BIGINT) AS id,
             CASE WHEN id = 2 THEN CAST(NULL AS BINARY)
                  ELSE st_aswkb(st_point(CAST(id AS DOUBLE), 1.0d)) END AS g
      FROM range(0, 3)""")
    val rows = KnnJoin.knnTiled(spark, spark.table("knn_p8"), spark.table("knn_b8"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // probe 0 (empty) emits nothing; build 2 (null) never appears
    assert(rows.forall(_._1 != 0L) && rows.forall(_._2 != 2L))
    assert(rows.toSet == Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
  }

  test("k larger than the build side returns every build row, ranked") {
    pts("knn_p2", "SELECT CAST(1 AS BIGINT) AS id, st_aswkb(st_point(0.0d, 0.0d)) AS g")
    pts("knn_b2", """
      SELECT CAST(id AS BIGINT) AS id, st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) AS g
      FROM range(0, 3)""")
    val rows = KnnJoin.knn(spark, spark.table("knn_p2"), spark.table("knn_b2"), 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(rows == Seq((0L, 1), (1L, 2), (2L, 3)))
  }
}
