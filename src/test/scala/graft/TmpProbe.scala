package graft
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    Graft.register(spark)
    for (f <- Seq("st_extent", "st_collectionextract", "st_ngeometries", "st_npoints", "st_centroid", "st_perimeter", "st_isempty", "st_length", "st_xy", "st_area")) {
      val p = s"/root/reference/test/sql/geometry/$f.test"
      val o = SqlLogicTest.runFile(spark, p)
      println(s"## $f pass=${o.passed} dialect=${o.unsupported}")
      o.unsupportedQueries.foreach { q => println("   SKIP " + q.take(100)) }
    }
    // direct error for the create
    try spark.sql("CREATE TABLE probe_types (geom BINARY) USING parquet").collect()
    catch { case e: Exception => println("CREATE ERR: " + e.getMessage.take(200)) }
  }
}
