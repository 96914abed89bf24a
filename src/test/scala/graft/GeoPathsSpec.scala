package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Path resolution for the geo DSv2 source at ingest scale: recursive
  * directory trees (partitioned `year=.../part-N` layouts), glob patterns,
  * and multi-path load() — the shapes a 100 TB corpus actually arrives in.
  * Listing is driver-side names-only; content reads stay on executors. */
class GeoPathsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir: String = {
    val d = Files.createTempDirectory("graft_paths").toString
    def put(rel: String, n: Int, base: Int): Unit = {
      val p = Paths.get(d, rel)
      Files.createDirectories(p.getParent)
      val lines = (0 until n).map { i =>
        s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[${base + i},1]},"properties":{"k":${base + i}}}"""
      }
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    }
    put("year=2023/part-0.geojsonl", 3, 0)
    put("year=2023/part-1.geojsonl", 2, 100)
    put("year=2024/part-0.geojsonl", 4, 200)
    put("other/notes.txt", 0, 0) // must be ignored by extension filter
    Files.write(Paths.get(d, "README.md"), "not geo\n".getBytes("UTF-8"))
    d
  }

  test("directory load is recursive and extension-filtered") {
    val df = spark.read.format("geo").load(dir)
    assert(df.count() == 9)
    assert(df.selectExpr("max(cast(k AS BIGINT))").head().getLong(0) == 203L)
  }

  test("glob within a segment selects matching subtrees only") {
    val df = spark.read.format("geo").load(s"$dir/year=2023/part-*.geojsonl")
    assert(df.count() == 5)
    val df24 = spark.read.format("geo").load(s"$dir/year=*/part-0.geojsonl")
    assert(df24.count() == 7) // part-0 of both years
  }

  test("** crosses directory levels") {
    val df = spark.read.format("geo").load(s"$dir/**/part-1.geojsonl")
    assert(df.count() == 2)
  }

  test("multi-path load() unions expansions") {
    val df = spark.read.format("geo")
      .load(s"$dir/year=2023/part-0.geojsonl", s"$dir/year=2024")
    assert(df.count() == 7)
  }

  test("paths JSON array parsing handles escapes; non-JSON passes through") {
    import graft.io.GeoFiles
    assert(GeoFiles.parseJsonStringArray("""["/a/b.shp","/c d/e.shp"]""") ==
      Seq("/a/b.shp", "/c d/e.shp"))
    assert(GeoFiles.parseJsonStringArray("""["/a/é.shp","x\\y"]""") ==
      Seq("/a/é.shp", "x\\y"))
    assert(GeoFiles.parseJsonStringArray("/plain/path.shp") == Seq("/plain/path.shp"))
  }

  test("a glob matching nothing fails loudly") {
    val e = intercept[IllegalArgumentException](
      spark.read.format("geo").load(s"$dir/year=1999/*.geojsonl"))
    assert(e.getMessage.contains("no files match"))
  }
}
