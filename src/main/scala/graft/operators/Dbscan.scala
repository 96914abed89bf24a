package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/**
 * Distributed DBSCAN (Ester et al. 1996; PostGIS exposes the same semantics
 * as ST_ClusterDBSCAN) assembled from the scale-shaped pieces graft already
 * has:
 *
 *   1. eps-neighbor pairs via `st_dwithin` — the spatial join rules turn
 *      this into a radius-expanded TILE equi-join (or a broadcast R-tree
 *      probe for small inputs): never an all-pairs scan.
 *   2. core test: |N_eps(p)| + 1 >= minPts (the point counts itself).
 *   3. clusters = hash-min connected components over core–core edges
 *      ([[NearDupCluster.connectedComponents]], no driver graph state);
 *      isolated cores keep their own label via self-edges.
 *   4. border points (non-core with a core neighbor) attach to the MINIMUM
 *      core neighbor's cluster — deterministic where standard DBSCAN is
 *      order-dependent. Everything else is noise (cluster -1).
 *
 * Labels are the minimum member id of each cluster's core set, so results
 * are reproducible row for row — oracle-checkable against an independent
 * transitive closure.
 */
object Dbscan {

  /** @param points columns (id: numeric, x: double, y: double)
   *  @return DataFrame(id, cluster LONG — -1 = noise, role: core|border|noise) */
  def cluster(spark: SparkSession, points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    graft.Graft.register(spark)
    require(eps > 0 && minPts >= 1)
    val p = points.selectExpr("CAST(id AS LONG) AS id", "st_point(x, y) AS pt")
    // Eager localCheckpoints, not .cache(): the eps-neighbor edge set (the
    // expensive tile join) and the core set each feed 3-4 downstream joins
    // from materialized blocks, with no CacheManager registration — the old
    // caches were never unpersisted, so a later invocation's canonically
    // equal plan was served from the first run's blocks (cross-run reuse).
    val e = p.as("a").join(p.as("b"),
        F.expr(s"st_dwithin(a.pt, b.pt, ${eps}d)") && F.col("a.id") =!= F.col("b.id"))
      .select(F.col("a.id").as("u"), F.col("b.id").as("v"))
      .localCheckpoint(eager = true)

    val core = e.groupBy(F.col("u").as("id")).count()
      .filter(F.col("count") + 1 >= minPts).select("id").localCheckpoint(eager = true)

    val coreEdges = e
      .join(core.withColumnRenamed("id", "cu"), F.col("u") === F.col("cu")).drop("cu")
      .join(core.withColumnRenamed("id", "cv"), F.col("v") === F.col("cv")).drop("cv")
      .union(core.select(F.col("id").as("u"), F.col("id").as("v"))) // isolated cores
    val cc = NearDupCluster.connectedComponents(coreEdges, "u", "v")
      .toDF("cid", "cluster")

    val border = e
      .join(core.withColumnRenamed("id", "cv"), F.col("v") === F.col("cv")).drop("cv")
      .join(core.withColumnRenamed("id", "cu"), F.col("u") === F.col("cu"), "left_anti")
      .join(cc, F.col("v") === F.col("cid"))
      .groupBy(F.col("u").as("bid")).agg(F.min("cluster").as("bcluster"))

    val out = p.select("id")
      .join(cc, F.col("id") === F.col("cid"), "left").drop("cid")
      .join(border, F.col("id") === F.col("bid"), "left").drop("bid")
      .select(F.col("id"),
        F.coalesce(F.col("cluster"), F.col("bcluster"), F.lit(-1L)).as("cluster"),
        F.when(F.col("cluster").isNotNull, "core")
          .when(F.col("bcluster").isNotNull, "border")
          .otherwise("noise").as("role"))
    out
  }
}
