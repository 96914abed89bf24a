package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/**
 * Lloyd k-means over 2-D points (the semantics PostGIS exposes as
 * ST_ClusterKMeans, with DETERMINISTIC seeding so results are
 * oracle-checkable): initial centroids are the first k points in id order
 * (cluster ids 0..k-1), a fixed number of assign/update rounds, ties broken
 * by cluster id.
 *
 * Scale shape: centroids live on the driver (k rows) and enter the plan as
 * literals — each round is ONE map-side-combined groupBy over the points
 * (sum/count per cluster), no shuffle of anything but k partial states per
 * partition. Assignment is a codegen'd array_min over per-centroid
 * (distance, id) structs — no UDF. With integral input coordinates every
 * centroid is an exact integer-sum / count division, so independent engines
 * reproduce the trajectory bit for bit.
 */
object KMeans {

  /** @param points columns (id, x, y); k ≤ first-point count
   *  @return DataFrame(id, cluster INT, cx, cy) — assignment against the
   *          centroids after `iters` update rounds */
  def cluster(spark: SparkSession, points: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0)
    val p = points.selectExpr("CAST(id AS LONG) AS id", "CAST(x AS DOUBLE) AS x",
      "CAST(y AS DOUBLE) AS y")
      // null coordinates have no distance — drop them (they would surface as
      // a null groupBy key and break the centroid update)
      .where("id IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL")
      .cache()

    var cents: Array[(Int, Double, Double)] = p.orderBy("id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getDouble(1), r.getDouble(2)) }

    def assignCol(cs: Array[(Int, Double, Double)]): Column = {
      val alts = cs.map { case (cid, cx, cy) =>
        F.struct(
          (F.col("x") - F.lit(cx)) * (F.col("x") - F.lit(cx)) +
            (F.col("y") - F.lit(cy)) * (F.col("y") - F.lit(cy)) as "d",
          F.lit(cid) as "c")
      }
      F.array_min(F.array(alts: _*)).getField("c")
    }

    for (_ <- 0 until iters) {
      val sums = p.groupBy(assignCol(cents).as("c"))
        .agg(F.sum("x").as("sx"), F.sum("y").as("sy"), F.count(F.lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
      cents = cents.map { case (cid, cx, cy) =>
        sums.get(cid) match {
          case Some((sx, sy, n)) if n > 0 => (cid, sx / n, sy / n)
          case _ => (cid, cx, cy) // empty cluster keeps its centroid
        }
      }
    }

    val cxCol = F.element_at(
      F.array(cents.sortBy(_._1).map(c => F.lit(c._2)): _*), F.col("cluster") + 1)
    val cyCol = F.element_at(
      F.array(cents.sortBy(_._1).map(c => F.lit(c._3)): _*), F.col("cluster") + 1)
    p.select(F.col("id"), assignCol(cents).cast("int").as("cluster"), F.col("x"), F.col("y"))
      .select(F.col("id"), F.col("cluster"), cxCol.as("cx"), cyCol.as("cy"))
  }
}
