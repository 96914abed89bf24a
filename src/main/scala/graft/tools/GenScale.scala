package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-up generator for the contract testdata: replicates a driver-written
  * sf directory N× with consistent key offsets so every foreign-key
  * relationship survives (orders↔lineitem↔part/supplier, customer↔orders,
  * documents↔embeddings share one id stride). Used to produce the sf1 scale
  * point for the 10×-data correctness + bench runs — the oracle comparison
  * stays exact because DuckDB and Spark both read the generated files.
  *
  * Copy 0 is byte-identical to the base rows (literal-pinned queries keep
  * their rows); copies ≥1 shift every key by `copy × stride` where stride is
  * the base table's dense key-space size. Document text is rotated left by
  * `copy` characters (length-preserving, so `n_chars` stays an invariant;
  * shingle sets shift only at the seam, so near-dup structure stays
  * realistic instead of 10 exact clones per doc). Embedding copy ≥1 gets a
  * deterministic 1e-3 nudge on one dimension so distance ties never depend
  * on row order. Dimension tables (region, nation) keep TPC-H's fixed
  * cardinality.
  *
  * Usage: runMain graft.tools.GenScale <baseDir> <outDir> <copies>
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, copiesS) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-genscale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    genscale(spark, baseDir, outDir, copiesS.toInt)
    println(s"[genscale] wrote ${copiesS}x of $baseDir to $outDir")
    spark.stop()
    sys.exit(0)
  }

  def genscale(spark: SparkSession, baseDir: String, outDir: String, copies: Int): Unit = {
    require(copies >= 1, "copies must be >= 1")

    def base(t: String): DataFrame = spark.read.parquet(s"$baseDir/$t.parquet")

    // Dense 0-based key spaces → stride = exact table size (or id-space max+1)
    val custStride = base("customer").count()
    val ordStride = base("orders").count()
    val partStride = base("part").count()
    val suppStride = base("supplier").count()
    val evStride = base("events").count()
    val userStride = base("events").selectExpr("max(user_id)+1").head().getLong(0)
    // documents and embeddings share one id space (vec_id ⊂ doc_id range):
    // one stride keeps the FK meaningful per copy
    val docStride = base("documents").count()

    /** N stacked copies of `t`, `exprs(c)` giving the per-copy projection. */
    def scaled(t: String, exprs: Int => Seq[String]): DataFrame =
      (0 until copies).map(c => base(t).selectExpr(exprs(c): _*)).reduce(_ union _)

    def write(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")

    // fixed-cardinality dimensions: pass through
    write(base("region"), "region", 1)
    write(base("nation"), "nation", 1)

    write(scaled("customer", c => Seq(
      s"c_custkey + ${c * custStride} AS c_custkey",
      "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")), "customer", 2)

    write(scaled("supplier", c => Seq(
      s"s_suppkey + ${c * suppStride} AS s_suppkey",
      "s_name", "s_nationkey", "s_acctbal")), "supplier", 1)

    write(scaled("part", c => Seq(
      s"p_partkey + ${c * partStride} AS p_partkey",
      "p_name", "p_brand", "p_type", "p_size", "p_retailprice")), "part", 2)

    write(scaled("orders", c => Seq(
      s"o_orderkey + ${c * ordStride} AS o_orderkey",
      s"o_custkey + ${c * custStride} AS o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")),
      "orders", 4)

    write(scaled("lineitem", c => Seq(
      s"l_orderkey + ${c * ordStride} AS l_orderkey",
      s"l_partkey + ${c * partStride} AS l_partkey",
      s"l_suppkey + ${c * suppStride} AS l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")), "lineitem", 16)

    write(scaled("events", c => Seq(
      s"event_id + ${c * evStride} AS event_id", "ts",
      s"user_id + ${c * userStride} AS user_id",
      "event_type", "value", "props")), "events", 4)

    write(scaled("documents", c => Seq(
      s"doc_id + ${c * docStride} AS doc_id",
      // left-rotate by c chars: length-preserving, near-identical shingles
      s"concat(substring(text, ${c + 1}), substring(text, 1, $c)) AS text",
      "lang", "source", "n_chars")), "documents", 2)

    write(scaled("embeddings", c => Seq(
      s"vec_id + ${c * docStride} AS vec_id",
      (if (c == 0) "embedding"
       else s"transform(embedding, (x, i) -> IF(i = ${c % 64}, " +
            s"CAST(x + ${c}e-3 AS FLOAT), x)) AS embedding"),
      "label")), "embeddings", 2)
  }
}
