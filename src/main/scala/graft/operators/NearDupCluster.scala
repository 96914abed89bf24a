package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/**
 * Connected components over a near-duplicate pair list, producing one cluster
 * label (the minimum member id) per document — the standard final step of a
 * MinHash/LSH dedup pipeline: pairs → clusters → keep one canonical doc per
 * cluster.
 *
 * Algorithm: hash-min label propagation. Each round every vertex takes the
 * minimum label among itself and its neighbors; labels are monotonically
 * non-increasing, so the sum of labels is a convergence witness (unchanged
 * sum ⟺ fixed point). Each round costs one shuffle-by-id join plus one
 * map-side-combined min aggregate — no driver-side graph state, no
 * all-pairs step anywhere.
 *
 * Scale notes (100 TB lens): rounds needed = graph diameter. Near-dup graphs
 * from banded LSH are unions of near-cliques (every member of a bucket pairs
 * with every other), so diameters are small constants and hash-min converges
 * in a handful of rounds at optimal per-round cost. For adversarial
 * long-chain graphs the large-star/small-star alternation (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC 2014) bounds rounds by
 * O(log n); it is deliberately not used here because its per-round edge
 * rewrites cost more on the dense-cluster shape that dedup graphs actually
 * have. The label sum is accumulated as DECIMAL(38,0) so the convergence
 * check cannot overflow on 64-bit ids.
 */
object NearDupCluster {

  /** Edge sets below this collect to the driver and run union-find — the
   *  iterative hash-min loop costs ~4 Spark stages PER ROUND in scheduler
   *  latency, which dwarfs the work when the graph fits in one task (same
   *  principle as broadcasting a small join side). 1M edges = 16 MB. */
  private val driverEdgeCutoff = 1 << 20

  /** @param pairs DataFrame with two id columns (one row per near-dup pair)
   *  @return DataFrame(id LONG, component LONG) — component = min id reachable */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(F.col(aCol).cast("long").as("src"), F.col(bCol).cast("long").as("dst"))
    // Bounded probe, materialized ONCE: collect at most cutoff+1 rows and use
    // that same array for both the path decision and the union-find. Probing
    // with a separate count() and re-collecting would run the upstream plan
    // twice — a non-deterministic or changed source could then return far
    // more rows the second time (driver OOM risk) or fewer (silent slow path).
    val probeRows = edges.limit(driverEdgeCutoff + 1).collect()
    if (probeRows.length <= driverEdgeCutoff)
      return driverUnionFind(pairs.sparkSession, probeRows)
    // Lazy localCheckpoints, not .cache(): each round's labelSum action
    // materializes the marked frame in the same job (job-count neutral vs the
    // old cache), the per-round lineage is TRUNCATED instead of chaining
    // through every prior round, and nothing registers with CacheManager —
    // the old final `labels` cache was returned still persisted, so a later
    // invocation's canonically equal plan was served from the first run's
    // blocks (cross-run reuse).
    val sym = edges.union(edges.select(F.col("dst").as("src"), F.col("src").as("dst")))
      .distinct().localCheckpoint(eager = false)
    // Initialize each label at min(id, min neighbor) rather than id — one
    // groupBy that would otherwise be the entire first iteration. Pair-shaped
    // components (the common near-dup case) converge immediately.
    var labels = sym.groupBy(F.col("src").as("id"))
      .agg(F.least(F.col("src"), F.min("dst")).as("comp")).localCheckpoint(eager = false)
    var checksum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst").as("mid")).agg(F.min("comp").as("msg"))
      val next = labels.join(msgs, labels("id") === msgs("mid"), "left")
        .select(labels("id"),
          F.least(F.col("comp"), F.coalesce(F.col("msg"), F.col("comp"))).as("comp"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum == checksum
      checksum = nextSum
      iter += 1
    }
    labels
  }

  private def labelSum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).head.getDecimal(0)

  /** Exact union-find on the driver over the already-collected edge rows;
   *  identical semantics (component = min reachable id). */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // keep the smaller root so labels are min ids
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    rows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) union(r.getLong(0), r.getLong(1))
    }
    val ids = rows.iterator.flatMap(r =>
      Seq(if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1))).flatten).toSet
    import spark.implicits._
    ids.toSeq.map(id => (id, find(id))).toDF("id", "comp")
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Convenience: cluster label + cluster size + canonical flag (the member
   *  every dedup pipeline keeps — the minimum id). */
  def clusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    cc.select(F.col("id").as("doc_id"), F.col("comp").as("component"))
      .withColumn("cluster_size", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("component")).cast("int"))
      .withColumn("is_canonical", F.col("doc_id") === F.col("component"))
  }
}
