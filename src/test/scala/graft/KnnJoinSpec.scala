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

  test("over-threshold build side fails loudly before any collect") {
    pts("knn_p4", "SELECT CAST(1 AS BIGINT) AS id, st_aswkb(st_point(0.0d, 0.0d)) AS g")
    pts("knn_b4", """
      SELECT CAST(id AS BIGINT) AS id, st_aswkb(st_point(CAST(id AS DOUBLE), 0.0d)) AS g
      FROM range(0, 1000)""")
    val prev = spark.conf.getOption("spark.graft.spatialJoin.broadcastThreshold")
    spark.conf.set("spark.graft.spatialJoin.broadcastThreshold", "64")
    try {
      val e = intercept[IllegalArgumentException] {
        KnnJoin.knn(spark, spark.table("knn_p4"), spark.table("knn_b4"), 2)
      }
      assert(e.getMessage.contains("spark.graft.spatialJoin.broadcastThreshold"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.spatialJoin.broadcastThreshold", v)
        case None => spark.conf.unset("spark.graft.spatialJoin.broadcastThreshold")
      }
    }
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
