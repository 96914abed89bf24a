package graft.scratch

import graft.{SparkTestSession, SqlLogicTest}

object SkipProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dirs = Seq("/root/reference/test/sql/geometry", "/root/reference/test/sql",
      "/root/reference/test/sql/geos", "/root/reference/test/sql/postgis",
      "/root/reference/test/sql/gdal", "/root/reference/test/sql/shapefile",
      "/root/reference/test/sql/index")
    val files = dirs.flatMap(d => Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".test"))).sortBy(_.getPath)
    files.foreach { f =>
      val o = SqlLogicTest.runFile(spark, f.getPath)
      if (o.unsupported > 0)
        o.unsupportedQueries.foreach(q => println(s"SKIP ${f.getName}: ${q.take(110)}"))
    }
  }
}
