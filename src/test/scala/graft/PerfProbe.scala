package graft

/** Dev micro-probe: isolate JTS/codec cost from Spark plumbing.
  * Run: sbt "Test/runMain graft.PerfProbe" */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    import graft.geom.{Geo, Wkb}
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val n = 600000
    // envelopes like q_overlay_area
    time("box construct+wkb") {
      var i = 0
      while (i < n) { Wkb.write(Geo.box(i % 12, 0, i % 12 + 10, 10)); i += 1 }
    }
    val boxes = (0 until 12).map(a => Geo.box(a, 0, a + 10, 10)).toArray
    val b2 = Geo.box(5, 2, 15, 9)
    time("jts union x600k") {
      var i = 0
      while (i < n) { boxes(i % 12).union(b2); i += 1 }
    }
    time("jts difference x600k") {
      var i = 0
      while (i < n) { boxes(i % 12).difference(b2); i += 1 }
    }
    time("jts intersection x600k") {
      var i = 0
      while (i < n) { boxes(i % 12).intersection(b2); i += 1 }
    }
    // full expression-path: parse WKB each time like the FnExpr would
    val wkbA = boxes.map(Wkb.write)
    val wkbB = Wkb.write(b2)
    time("wkb read x1.2M") {
      var i = 0
      while (i < n) { Geo.read(wkbA(i % 12)); Geo.read(wkbB); i += 1 }
    }
  }
}

object PerfProbeSpark {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.register(spark)
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val fn = SparkEntry.queries("q_overlay_area")
    time("q_overlay_area full")(fn(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count())
    time("q_overlay_area again")(fn(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count())
    // without ORDER BY: project only
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").repartition(32).createOrReplaceTempView("lineitem")
    time("project only (no sort)") {
      spark.sql("""
        SELECT st_area(st_union(st_makeenvelope(a, 0.0d, a + 10.0d, 10.0d), st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS u,
               st_area(st_difference(st_makeenvelope(a, 0.0d, a + 10.0d, 10.0d), st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS d
        FROM (SELECT cast(l_partkey % 12 AS DOUBLE) AS a FROM lineitem)""").queryExecution.toRdd.count()
    }
    spark.stop()
  }
}

/** Plan audit: verify pruning/pushdown reach the scans (run ad hoc). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.register(spark)
    for (name <- Seq("q_point_xy", "q_extent_agg", "q_spatial_join", "q_dedup_exact", "q_ann_bruteforce")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val reads = plan.linesIterator.filter(l => l.contains("ReadSchema")).map(_.trim.take(200)).toList
      val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.take(120)).toList
      println(s"== $name")
      reads.foreach(r => println("  " + r))
      joins.foreach(j => println("  " + j))
    }
    spark.stop()
  }
}

object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.register(spark)
    val df = spark.range(10).selectExpr("st_area(st_makeenvelope(0.0d, 0.0d, cast(id AS DOUBLE), 2.0d)) AS a")
    df.queryExecution.executedPlan.toString.linesIterator.take(6).foreach(println)
    println("result: " + df.collect().map(_.getDouble(0)).sum)
  }
}
