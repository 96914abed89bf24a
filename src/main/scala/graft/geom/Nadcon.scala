package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** NOAA NADCON `.las`/`.los` grid-shift pairs (NAD27 → NAD83 and the
  * HARN/NADCON 5 lineage distribute their conterminous-US shifts in this
  * format; the reference reaches them through PROJ's grid machinery,
  * reference proj/module.cpp:14-47).
  *
  * Layout from the public NOAA NADCON documentation (NOAA TM NOS NGS-50) as
  * also implemented by GDAL's LOSLAS driver and PROJ's nad conversion:
  * fixed-record-length direct-access binary, record length = 4*(NC+1) bytes.
  *   - Record 0 (header): ident char[56], program char[8], NC int32,
  *     NR int32, NZ int32, XMIN float32, DX float32, YMIN float32,
  *     DY float32, ANGLE float32 — XMIN/YMIN in east-positive degrees at the
  *     south-west grid corner, DX/DY in degrees.
  *   - Records 1..NR (south → north): a 4-byte row index followed by NC
  *     float32 shift values (west → east columns), arc-seconds.
  * `.las` carries Δlat (target − source); `.los` carries Δlon arc-seconds
  * POSITIVE WEST (the NADCON convention for CONUS, same sign stance as
  * NTv2), so lon_target = lon_source − Δlon_west/3600.
  *
  * Both files are parsed into the [[NtV2]] grid model (west-positive
  * arc-second bounds, longitude fastest) so every downstream transform path
  * — bilinear pick, densest-subgrid selection, inverse iteration — is shared
  * with `.gsb` grids.
  */
object Nadcon {

  private def fail(msg: String, src: String): Nothing =
    throw new IllegalArgumentException(s"NADCON: $msg in '$src'")

  private final case class Header(nc: Int, nr: Int, nz: Int,
                                  xMin: Float, dx: Float, yMin: Float, dy: Float)

  private def readHeader(bytes: Array[Byte], src: String): Header = {
    if (bytes.length < 96) fail("truncated header", src)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val h = Header(bb.getInt(64), bb.getInt(68), bb.getInt(72),
      bb.getFloat(76), bb.getFloat(80), bb.getFloat(84), bb.getFloat(88))
    if (h.nc < 2 || h.nc > 100000 || h.nr < 2 || h.nr > 100000)
      fail(s"implausible grid dimensions ${h.nc}x${h.nr} (not a .las/.los file?)", src)
    if (h.dx <= 0 || h.dy <= 0) fail("non-positive grid increment", src)
    val recLen = 4 * (h.nc + 1)
    if (recLen < 96) fail(s"record length $recLen cannot hold the header (NC too small)", src)
    if (bytes.length.toLong < recLen.toLong * (h.nr + 1)) fail("truncated node records", src)
    h
  }

  /** values row-major south→north, west→east (row index bytes dropped) */
  private def readValues(bytes: Array[Byte], h: Header): Array[Float] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val recLen = 4 * (h.nc + 1)
    val out = new Array[Float](h.nc * h.nr)
    var r = 0
    while (r < h.nr) {
      val base = recLen * (r + 1) + 4 // +4 skips the row index
      var c = 0
      while (c < h.nc) { out(r * h.nc + c) = bb.getFloat(base + 4 * c); c += 1 }
      r += 1
    }
    out
  }

  /** Parse a `.las`/`.los` pair into the shared NTv2 grid model. */
  def parsePair(las: Array[Byte], los: Array[Byte], source: String): NtV2.Grid = {
    val hLat = readHeader(las, source + ".las")
    val hLon = readHeader(los, source + ".los")
    if (hLat != hLon) fail("mismatched .las/.los headers", source)
    val latShift = readValues(las, hLat)
    val lonShiftW = readValues(los, hLon)
    // east-positive degree bounds → NTv2's west-positive arc-second frame:
    // east column c sits at xMin + c*dx, i.e. west-seconds -(xMin + c*dx)*3600,
    // so NTv2's E_LONG (least-west) corresponds to the EASTERNMOST column and
    // the column order must flip to keep "longitude increasing westward".
    val nc = hLat.nc; val nr = hLat.nr
    val flippedLat = new Array[Float](nc * nr)
    val flippedLonW = new Array[Float](nc * nr)
    var r = 0
    while (r < nr) {
      var c = 0
      while (c < nc) {
        flippedLat(r * nc + c) = latShift(r * nc + (nc - 1 - c))
        flippedLonW(r * nc + c) = lonShiftW(r * nc + (nc - 1 - c))
        c += 1
      }
      r += 1
    }
    val eLonW = -(hLat.xMin + (nc - 1) * hLat.dx).toDouble * 3600.0
    val wLonW = -hLat.xMin.toDouble * 3600.0
    val sLat = hLat.yMin.toDouble * 3600.0
    val nLat = (hLat.yMin + (nr - 1) * hLat.dy).toDouble * 3600.0
    NtV2.Grid(Vector(NtV2.SubGrid("NADCON", "NONE", sLat, nLat, eLonW, wLonW,
      hLat.dy * 3600.0, hLat.dx * 3600.0, nr, nc, flippedLat, flippedLonW)), source)
  }

  /** Load a pair by its shared base path (or either member's path). */
  def load(path: String): NtV2.Grid = {
    val base =
      if (path.toLowerCase.endsWith(".las") || path.toLowerCase.endsWith(".los"))
        path.dropRight(4)
      else path
    def bytes(ext: String): Array[Byte] = {
      val f = new java.io.File(base + ext)
      if (!f.isFile) throw new IllegalArgumentException(
        s"ST_Transform: NADCON grid file not found: '${base + ext}'")
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    parsePair(bytes(".las"), bytes(".los"), base)
  }

  /** Serialize one shift plane to `.las`/`.los` bytes (row-major south→north,
    * west→east, east-positive degree origin) — round-trips through
    * [[parsePair]]; used to materialize synthetic/test grids. */
  def writePlane(nc: Int, nr: Int, xMinEast: Float, dx: Float, yMin: Float, dy: Float,
                 values: Array[Float], ident: String = "graft synthetic NADCON grid"): Array[Byte] = {
    require(values.length == nc * nr, s"expected ${nc * nr} values, got ${values.length}")
    val recLen = 4 * (nc + 1)
    require(recLen >= 96, s"NC=$nc too small for the header record")
    val bb = ByteBuffer.allocate(recLen * (nr + 1)).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(String.format("%-56s", ident).substring(0, 56).getBytes("US-ASCII"))
    bb.put(String.format("%-8s", "GRAFT").getBytes("US-ASCII"))
    bb.putInt(nc).putInt(nr).putInt(1)
    bb.putFloat(xMinEast).putFloat(dx).putFloat(yMin).putFloat(dy).putFloat(0f)
    var r = 0
    while (r < nr) {
      bb.position(recLen * (r + 1))
      bb.putInt(r + 1)
      var c = 0
      while (c < nc) { bb.putFloat(values(r * nc + c)); c += 1 }
      r += 1
    }
    bb.array()
  }
}
