package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.Coordinate

/** Remote `http(s)://` input — the `/vsicurl/` equivalent (reference:
  * test/sql/gdal/gdal_vsi.test reads datasets over GDAL's curl virtual
  * filesystem). Spellings: a plain URL, `/vsicurl/http://…`, a remote `.zip`
  * (bare or with `!entry`), and the chained `/vsizip//vsicurl/http://…`.
  * Objects localize lazily to a per-JVM cache on the executor that reads
  * them — the fixture server here stands in for the remote object store. */
class HttpReadSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private lazy val fac = graft.geom.Geo.factory

  /** one-shot fixture HTTP server rooted at a temp dir */
  private def withServer(files: Map[String, Array[Byte]])(body: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val p = ex.getRequestURI.getPath.stripPrefix("/")
        files.get(p) match {
          case Some(bytes) if ex.getRequestMethod == "HEAD" =>
            ex.getResponseHeaders.add("Last-Modified", "Tue, 01 Jan 2030 00:00:00 GMT")
            ex.sendResponseHeaders(200, -1)
          case Some(bytes) =>
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
          case None =>
            ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def gjl(n: Int): Array[Byte] =
    (1 to n).map(i =>
      s"""{"type":"Feature","geometry":{"type":"Point","coordinates":[$i,$i]},"properties":{"n":"f$i"}}""")
      .mkString("\n").getBytes("UTF-8")

  test("plain URL and /vsicurl/ spelling read a served geojsonl") {
    withServer(Map("data/pts.geojsonl" -> gjl(5))) { base =>
      val df = spark.read.format("geo").load(s"$base/data/pts.geojsonl")
      assert(df.count() == 5)
      val xs = df.selectExpr("st_x(st_geomfromwkb(geom)) AS x")
        .collect().map(_.getDouble(0)).sorted.toSeq
      assert(xs == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
      // GDAL spelling is a no-op prefix
      assert(spark.read.format("geo")
        .load(s"/vsicurl/$base/data/pts.geojsonl").count() == 5)
      // SQL surface
      Graft.register(spark)
      assert(spark.sql(s"SELECT count(*) FROM st_read('$base/data/pts.geojsonl')")
        .collect()(0).getLong(0) == 5)
    }
  }

  test("remote shapefile localizes its sidecar family") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_shp")
    val basePath = dir.resolve("pts").toString
    graft.io.ShapefileWriter.write(basePath,
      Seq(graft.io.ShapefileWriter.Field("name", 'C', 16, 0)),
      (1 to 4).iterator.map(i =>
        (fac.createPoint(new Coordinate(i, i)): org.locationtech.jts.geom.Geometry,
          Array[Any](s"p$i"))))
    val fam = Seq(".shp", ".shx", ".dbf", ".cpg").flatMap { ext =>
      val f = java.nio.file.Paths.get(basePath + ext)
      if (java.nio.file.Files.exists(f))
        Some(("pts" + ext) -> java.nio.file.Files.readAllBytes(f))
      else None
    }.toMap
    withServer(fam) { base =>
      val df = spark.read.format("geo").load(s"$base/pts.shp")
      assert(df.count() == 4)
      assert(df.selectExpr("name").collect().map(_.getString(0)).sorted.toSeq
        == Seq("p1", "p2", "p3", "p4"))
    }
  }

  test("remote zip: bare expansion, !entry, and chained /vsizip//vsicurl/") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_http_zip")
    val zp = tmp.resolve("data.zip")
    val zo = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zp))
    zo.putNextEntry(new java.util.zip.ZipEntry("a.geojsonl")); zo.write(gjl(3)); zo.closeEntry()
    zo.putNextEntry(new java.util.zip.ZipEntry("b.geojsonl")); zo.write(gjl(2)); zo.closeEntry()
    zo.close()
    val zipBytes = java.nio.file.Files.readAllBytes(zp)
    withServer(Map("data.zip" -> zipBytes)) { base =>
      // bare remote zip expands to every known-extension entry
      assert(spark.read.format("geo").load(s"$base/data.zip").count() == 5)
      // one entry
      assert(spark.read.format("geo").load(s"$base/data.zip!b.geojsonl").count() == 2)
      // GDAL chained spelling
      assert(spark.read.format("geo")
        .load(s"/vsizip//vsicurl/$base/data.zip/a.geojsonl").count() == 3)
    }
  }

  test("enable_external_access=false blocks remote reads") {
    withServer(Map("x.geojsonl" -> gjl(1))) { base =>
      spark.conf.set("enable_external_access", "false")
      try {
        val err = intercept[Exception] {
          spark.read.format("geo").load(s"$base/x.geojsonl").collect()
        }
        def chain(t: Throwable): Seq[String] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .map(x => String.valueOf(x.getMessage)).toSeq
        assert(chain(err).exists(_.contains("External access is disabled")), err.getMessage)
      } finally spark.conf.set("enable_external_access", "true")
    }
  }

  test("a 404 fails loudly, not as an empty dataset") {
    withServer(Map.empty) { base =>
      val err = intercept[Exception] {
        spark.read.format("geo").load(s"$base/missing.geojsonl").collect()
      }
      assert(err != null)
    }
  }
}
