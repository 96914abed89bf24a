package graft
import org.scalatest.funsuite.AnyFunSuite

class DumpDialectSpec extends AnyFunSuite {
  test("dump unsupported") {
    val spark = SparkTestSession.spark
    val dirs = Seq(
      "/root/reference/test/sql/geometry", "/root/reference/test/sql",
      "/root/reference/test/sql/geos", "/root/reference/test/sql/postgis",
      "/root/reference/test/sql/gdal", "/root/reference/test/sql/shapefile",
      "/root/reference/test/sql/index")
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    dirs.foreach { d =>
      val f = new java.io.File(d)
      if (f.isDirectory) f.listFiles().filter(_.getName.endsWith(".test")).foreach { t =>
        val o = SqlLogicTest.runFile(spark, t.getPath)
        o.unsupportedQueries.foreach { q =>
          val key = q.take(60)
          counts(key) += 1
        }
      }
    }
    counts.toSeq.sortBy(-_._2).take(40).foreach { case (q, n) => println(f"$n%3d  $q") }
  }
}
