package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.STRtree

/**
 * k-nearest-neighbor join: for each probe geometry, the k closest build
 * geometries with exact planar distances.
 *
 * Scale shape: the build side is broadcast (same budget as any broadcast
 * hash join) and ONE STRtree is built per executor (broadcast-id cache, same
 * pattern as the broadcast spatial join); probes stream through mapPartitions
 * with no shuffle. Each probe runs an EXPANDING-RADIUS search: query the
 * tree with a growing envelope until at least k candidates lie within the
 * radius and the k-th distance is covered — exact regardless of tree node
 * layout, and ties resolve deterministically by (distance, id), so results
 * are reproducible row for row (a plain JTS nearestNeighbour(k) is
 * tie-order-arbitrary at the cutoff).
 *
 * Inputs are (id, WKB) pairs to keep the encoder simple and the broadcast
 * compact; output is (pid, nid, dist, rank) with rank 1..k.
 */
object KnnJoin {

  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, STRtree]()

  private def tree(bc: Broadcast[Array[(Long, Array[Byte])]]): STRtree = {
    val hit = cache.get(bc.id)
    if (hit != null) return hit
    val t = new STRtree()
    bc.value.foreach { case (id, wkb) =>
      val g = graft.geom.Geo.read(wkb)
      if (g != null && !g.isEmpty) t.insert(g.getEnvelopeInternal, (id, g))
    }
    t.build()
    if (cache.size >= 8) cache.clear()
    cache.put(bc.id, t)
    t
  }

  private val ThresholdConf = "spark.graft.spatialJoin.broadcastThreshold"

  /** Exact kNN of `probe` against `build`; both DataFrames must have exactly
   *  (id: Long/Int, geom: WKB binary) columns.
   *
   *  The build side is driver-collected and broadcast, so it is gated by the
   *  SAME budget as every other broadcast path in the repo
   *  (spark.graft.spatialJoin.broadcastThreshold, falling back to
   *  spark.sql.autoBroadcastJoinThreshold): an over-threshold build side
   *  fails loudly BEFORE any collect instead of OOMing the driver. For build
   *  sides beyond broadcast budget, swap build/probe roles if the other side
   *  fits, or pre-filter the build side (e.g. by coarse tile) so it does.
   */
  def knn(spark: SparkSession, probe: DataFrame, build: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    require(k > 0, "k must be positive")
    val threshold = spark.conf.getOption(ThresholdConf).map(_.toLong)
      .getOrElse(spark.sessionState.conf.autoBroadcastJoinThreshold)
    val est = build.queryExecution.optimizedPlan.stats.sizeInBytes
    require(threshold > 0 && est <= threshold,
      s"knn build side estimated at $est bytes exceeds the broadcast budget " +
        s"($threshold); raise $ThresholdConf, swap probe/build, or pre-filter the build side")
    val buildRows = build.collect().map(r =>
      (r.get(0) match { case l: Long => l; case i: Int => i.toLong },
       r.get(1).asInstanceOf[Array[Byte]]))
    val bc = spark.sparkContext.broadcast(buildRows)
    val probeDs = probe.map(r =>
      (r.get(0) match { case l: Long => l; case i: Int => i.toLong },
       r.get(1).asInstanceOf[Array[Byte]]))
    probeDs.mapPartitions { it =>
      val t = tree(bc)
      // count INSERTED items, not raw build rows — null/empty build
      // geometries are skipped at tree build, and k > tree size would make
      // the expanding-radius search loop forever
      val n = t.size()
      it.flatMap { case (pid, wkb) =>
        val g = graft.geom.Geo.read(wkb)
        if (g == null || g.isEmpty || n == 0) Iterator.empty
        else {
          val kk = math.min(k, n)
          val res = search(t, g, kk)
          res.iterator.zipWithIndex.map { case ((nid, d), i) => (pid, nid, d, i + 1) }
        }
      }
    }.toDF("pid", "nid", "dist", "rank")
  }

  /** Expand the query envelope until the k-th (dist, id)-ordered candidate
   *  is within the searched radius — then no closer item can be outside. */
  private def search(t: STRtree, g: Geometry, k: Int): Array[(Long, Double)] = {
    val base = g.getEnvelopeInternal
    var r = math.max(math.max(base.getWidth, base.getHeight), 1e-9)
    while (true) {
      val env = new Envelope(base)
      env.expandBy(r)
      val cands = t.query(env).toArray.map { o =>
        val (id, bg) = o.asInstanceOf[(Long, Geometry)]
        (id, g.distance(bg))
      }.filter(_._2 <= r)
      if (cands.length >= k) {
        val sorted = cands.sortBy { case (id, d) => (d, id) }
        return sorted.take(k)
      }
      r *= 2
    }
    throw new IllegalStateException("unreachable")
  }
}
