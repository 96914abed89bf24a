package graft

import graft.ann.Ivf
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("IVF probe search: no all-pairs, decent recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.where("vec_id < 20")
    val cs = Ivf.centroids(emb, "vec_id", "embedding", k = 16, seed = 7)
    assert(cs.length == 16)

    val approx = Ivf.search(emb, queries, "vec_id", "embedding", cs, topK = 10, nprobe = 6)
      .collect().groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    // brute-force ground truth
    emb.createOrReplaceTempView("emb")
    val truth = spark.sql("""
      SELECT qid, nid FROM (
        SELECT q.vec_id AS qid, e.vec_id AS nid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 vec_cosine(cast(q.embedding AS array<double>), cast(e.embedding AS array<double>)) DESC, e.vec_id) AS rn
        FROM (SELECT * FROM emb WHERE vec_id < 20) q CROSS JOIN emb e
        WHERE q.vec_id != e.vec_id)
      WHERE rn <= 10""").collect().groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    val recalls = truth.map { case (q, t) =>
      approx.get(q).map(a => a.intersect(t).size.toDouble / t.size).getOrElse(0.0)
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall > 0.5, s"IVF recall too low: $meanRecall")

    // candidate set must be bounded: probing 6/16 clusters examines well under
    // the full corpus per query
    val candidates = Ivf.assign(emb, "vec_id", "embedding", cs)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    assert(candidates.sum == 500 && candidates.length > 4)

    // Lloyd refinement: the k-means objective (sum of distances to the
    // assigned centroid) must not increase, and recall must hold up
    val refined = Ivf.centroidsKmeans(emb, "vec_id", "embedding", k = 16, seed = 7, iters = 2)
    def objective(centroids: Array[Array[Double]]): Double = {
      Graft.register(spark)
      val csSql = centroids.map(_.mkString("array(", "d,", "d)")).mkString("array(", ",", ")")
      emb.selectExpr(
          s"vec_l2(cast(embedding AS array<double>), element_at($csSql, ivf_probe(cast(embedding AS array<double>), $csSql, 1)[0] + 1)) AS d")
        .agg(org.apache.spark.sql.functions.sum("d")).collect()(0).getDouble(0)
    }
    val before = objective(cs)
    val after = objective(refined)
    assert(after <= before * 1.0001, s"k-means objective rose: $before -> $after")

    val approx2 = Ivf.search(emb, queries, "vec_id", "embedding", refined, topK = 10, nprobe = 6)
      .collect().groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls2 = truth.map { case (q, t) =>
      approx2.get(q).map(a => a.intersect(t).size.toDouble / t.size).getOrElse(0.0)
    }
    val meanRecall2 = recalls2.sum / recalls2.size
    assert(meanRecall2 >= meanRecall - 0.05, s"refined recall fell: $meanRecall -> $meanRecall2")
  }
}
