package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-shift (.gsb) datum transformations.
  *
  * The reference reaches grid-shift datums (NAD27, OSGB36/OSTN15, …) through
  * PROJ's embedded grid machinery (reference proj/module.cpp:14-47,
  * functions.cpp:486-514). Graft implements the NTv2 binary format directly
  * from the public specification (the "National Transformation version 2
  * Developer's Guide", Geodetic Survey Division, Natural Resources Canada;
  * the same layout GDAL/PROJ document for `.gsb` files):
  *
  *   - 16-byte records: an 8-byte ASCII tag + an 8-byte value
  *     (int32 + 4 pad bytes, float64, or 8 ASCII chars).
  *   - Overview header (11 records): NUM_OREC=11, NUM_SREC=11, NUM_FILE,
  *     GS_TYPE ("SECONDS"), VERSION, SYSTEM_F/T, MAJOR/MINOR_F/T.
  *   - Per sub-grid, a header (11 records): SUB_NAME, PARENT, CREATED,
  *     UPDATED, S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC (all in
  *     arc-seconds, longitude positive WEST), GS_COUNT; then GS_COUNT
  *     16-byte nodes of 4 float32s: lat shift, lon shift (arc-seconds,
  *     lon positive west), lat accuracy, lon accuracy. Node 0 sits at
  *     (S_LAT, E_LONG); longitude varies fastest (increasing westward),
  *     then latitude south→north.
  *   - Either byte order; detected via NUM_OREC == 11.
  *
  * Shift semantics per the spec: values are (target − source), so
  * lat_target = lat_source + Δlat and, with east-positive longitudes,
  * lon_target = lon_source − Δlon_west. The inverse direction is the
  * standard fixed-point iteration (converges in 3-4 rounds; shifts are
  * arc-seconds against grid cells of arc-minutes).
  */
object NtV2 {

  /** One sub-grid: bounds/increments in arc-seconds, longitude positive west.
    * `latShiftSec`/`lonShiftSecW` are row-major, nCols per row, node 0 at the
    * (S_LAT, E_LONG) corner, longitude varying fastest. */
  final case class SubGrid(name: String, parent: String,
                           sLat: Double, nLat: Double, eLonW: Double, wLonW: Double,
                           latInc: Double, lonInc: Double,
                           nRows: Int, nCols: Int,
                           latShiftSec: Array[Float], lonShiftSecW: Array[Float]) {
    def contains(lonSecW: Double, latSec: Double): Boolean =
      latSec >= sLat - 1e-9 && latSec <= nLat + 1e-9 &&
      lonSecW >= eLonW - 1e-9 && lonSecW <= wLonW + 1e-9

    /** cell area — smaller = denser; used to pick the finest covering grid */
    def density: Double = latInc * lonInc

    /** bilinear (Δlat_sec, Δlon_sec_west) at a (west-seconds, lat-seconds) position */
    def interpolate(lonSecW: Double, latSec: Double): (Double, Double) = {
      val fc = (lonSecW - eLonW) / lonInc
      val fr = (latSec - sLat) / latInc
      var c0 = math.floor(fc).toInt
      var r0 = math.floor(fr).toInt
      if (c0 > nCols - 2) c0 = nCols - 2; if (c0 < 0) c0 = 0
      if (r0 > nRows - 2) r0 = nRows - 2; if (r0 < 0) r0 = 0
      val dx = fc - c0; val dy = fr - r0
      val i00 = r0 * nCols + c0
      def bil(a: Array[Float]): Double =
        a(i00) * (1 - dx) * (1 - dy) + a(i00 + 1) * dx * (1 - dy) +
        a(i00 + nCols) * (1 - dx) * dy + a(i00 + nCols + 1) * dx * dy
      (bil(latShiftSec), bil(lonShiftSecW))
    }
  }

  /** A loaded grid file (or concatenation of several from a `+nadgrids` list). */
  final case class Grid(subGrids: Vector[SubGrid], source: String) {

    private def pick(lonDeg: Double, latDeg: Double): SubGrid = {
      val lonW = -lonDeg * 3600.0; val lat = latDeg * 3600.0
      var best: SubGrid = null
      var i = 0
      while (i < subGrids.length) {
        val sg = subGrids(i)
        if (sg.contains(lonW, lat) && (best == null || sg.density < best.density)) best = sg
        i += 1
      }
      if (best == null) throw new IllegalArgumentException(
        s"ST_Transform: point ($lonDeg, $latDeg) is outside the NTv2 grid coverage of '$source'")
      best
    }

    /** source datum → target datum (e.g. NAD27 → NAD83), east-positive degrees */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val sg = pick(lonDeg, latDeg)
      val (dLat, dLonW) = sg.interpolate(-lonDeg * 3600.0, latDeg * 3600.0)
      (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
    }

    /** target datum → source datum (fixed-point iteration on [[forward]]) */
    def inverse(lonDeg: Double, latDeg: Double): (Double, Double) = {
      var lo = lonDeg; var la = latDeg
      var i = 0
      while (i < 10) {
        val (flo, fla) = forward(lo, la)
        val eLo = lonDeg - flo; val eLa = latDeg - fla
        lo += eLo; la += eLa
        if (math.abs(eLo) < 1e-13 && math.abs(eLa) < 1e-13) i = 10 else i += 1
      }
      (lo, la)
    }
  }

  private val Rec = 16

  /** Parse NTv2 bytes (auto byte order). Loud failure on anything malformed. */
  def parse(bytes: Array[Byte], source: String = "<bytes>"): Grid = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"NTv2: $msg in '$source'")
    if (bytes.length < 11 * Rec) fail("truncated overview header")
    def tagAt(off: Int): String = new String(bytes, off, 8, "US-ASCII").trim
    if (tagAt(0) != "NUM_OREC") fail(s"first record is '${tagAt(0)}', expected NUM_OREC (not an NTv2 file?)")
    val order =
      if (ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 11) ByteOrder.LITTLE_ENDIAN
      else if (ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.BIG_ENDIAN).getInt == 11) ByteOrder.BIG_ENDIAN
      else fail("NUM_OREC != 11 in either byte order")
    val bb = ByteBuffer.wrap(bytes).order(order)
    def i32(off: Int): Int = bb.getInt(off + 8)
    def f64(off: Int): Double = bb.getDouble(off + 8)
    def str(off: Int): String = new String(bytes, off + 8, 8, "US-ASCII").trim

    if (i32(1 * Rec) != 11) fail(s"NUM_SREC=${i32(1 * Rec)} (expected 11)")
    val nFile = i32(2 * Rec)
    if (nFile <= 0 || nFile > 10000) fail(s"NUM_FILE=$nFile out of range")
    val gsType = str(3 * Rec)
    if (gsType != "SECONDS") fail(s"GS_TYPE='$gsType' (only SECONDS is supported)")

    var off = 11 * Rec
    val subs = Vector.newBuilder[SubGrid]
    var f = 0
    while (f < nFile) {
      if (off + 11 * Rec > bytes.length) fail("truncated sub-grid header")
      if (tagAt(off) != "SUB_NAME") fail(s"record at $off is '${tagAt(off)}', expected SUB_NAME")
      val name = str(off)
      val parent = str(off + 1 * Rec)
      val sLat = f64(off + 4 * Rec); val nLat = f64(off + 5 * Rec)
      val eLon = f64(off + 6 * Rec); val wLon = f64(off + 7 * Rec)
      val latInc = f64(off + 8 * Rec); val lonInc = f64(off + 9 * Rec)
      val count = i32(off + 10 * Rec)
      if (latInc <= 0 || lonInc <= 0) fail(s"non-positive increment in sub-grid '$name'")
      if (nLat <= sLat || wLon <= eLon) fail(s"inverted bounds in sub-grid '$name'")
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      val nCols = math.round((wLon - eLon) / lonInc).toInt + 1
      if (nRows < 2 || nCols < 2) fail(s"degenerate ${nRows}x$nCols sub-grid '$name'")
      if (count != nRows * nCols)
        fail(s"GS_COUNT=$count but bounds/increments imply ${nRows}x$nCols=${nRows * nCols} in '$name'")
      off += 11 * Rec
      if (off + count.toLong * Rec > bytes.length) fail(s"truncated node block for sub-grid '$name'")
      val latS = new Array[Float](count); val lonS = new Array[Float](count)
      var i = 0
      while (i < count) {
        latS(i) = bb.getFloat(off); lonS(i) = bb.getFloat(off + 4)
        off += Rec; i += 1
      }
      subs += SubGrid(name, parent, sLat, nLat, eLon, wLon, latInc, lonInc, nRows, nCols, latS, lonS)
      f += 1
    }
    Grid(subs.result(), source)
  }

  /** Serialize a [[Grid]] to NTv2 `.gsb` bytes (round-trips through
    * [[parse]]; useful for materializing programmatic/synthetic grids). */
  def write(grid: Grid, order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val size = 11 * Rec + grid.subGrids.map(sg => 11 * Rec + sg.latShiftSec.length * Rec).sum
    val bb = ByteBuffer.allocate(size).order(order)
    def rec(tag: String)(put: => Unit): Unit = {
      bb.put(String.format("%-8s", tag).getBytes("US-ASCII")); val end = bb.position() + 8
      put; while (bb.position() < end) bb.put(0.toByte)
    }
    def recI(tag: String, v: Int): Unit = rec(tag)(bb.putInt(v))
    def recD(tag: String, v: Double): Unit = rec(tag)(bb.putDouble(v))
    def recS(tag: String, v: String): Unit = rec(tag)(bb.put(String.format("%-8s", v).take(8).getBytes("US-ASCII")))
    recI("NUM_OREC", 11); recI("NUM_SREC", 11); recI("NUM_FILE", grid.subGrids.length)
    recS("GS_TYPE", "SECONDS"); recS("VERSION", "NTv2.0")
    recS("SYSTEM_F", "SOURCE"); recS("SYSTEM_T", "TARGET")
    recD("MAJOR_F", 6378206.4); recD("MINOR_F", 6356583.8)
    recD("MAJOR_T", 6378137.0); recD("MINOR_T", 6356752.314)
    grid.subGrids.foreach { sg =>
      recS("SUB_NAME", sg.name); recS("PARENT", if (sg.parent.isEmpty) "NONE" else sg.parent)
      recS("CREATED", "20260101"); recS("UPDATED", "20260101")
      recD("S_LAT", sg.sLat); recD("N_LAT", sg.nLat)
      recD("E_LONG", sg.eLonW); recD("W_LONG", sg.wLonW)
      recD("LAT_INC", sg.latInc); recD("LONG_INC", sg.lonInc)
      recI("GS_COUNT", sg.latShiftSec.length)
      var i = 0
      while (i < sg.latShiftSec.length) {
        bb.putFloat(sg.latShiftSec(i)); bb.putFloat(sg.lonShiftSecW(i))
        bb.putFloat(0f); bb.putFloat(0f)
        i += 1
      }
    }
    bb.array()
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Grid]()

  /** Load and cache a grid file: `.gsb` (NTv2) or a NOAA `.las`/`.los`
    * NADCON pair (either member's path or the shared base). */
  def load(path: String): Grid = cache.computeIfAbsent(path, { p =>
    val l = p.toLowerCase
    if (l.endsWith(".las") || l.endsWith(".los")) Nadcon.load(p)
    else {
      val f = new java.io.File(p)
      if (!f.isFile) throw new IllegalArgumentException(
        s"ST_Transform: +nadgrids file not found: '$p'")
      parse(java.nio.file.Files.readAllBytes(f.toPath), p)
    }
  })

  /** Resolve a `+nadgrids=` list: comma-separated paths, `@` prefix =
    * optional (skipped when missing), `null` = PROJ's no-op sentinel.
    * Returns None when nothing loads (pure-sentinel / all-optional-missing). */
  def fromNadgridsSpec(spec: String): Option[Grid] = {
    val parts = spec.split(",").map(_.trim).filter(_.nonEmpty)
    val grids = parts.flatMap { p =>
      val optional = p.startsWith("@")
      val path = if (optional) p.drop(1) else p
      if (path == "null") None
      else if (optional && !new java.io.File(path).isFile) None
      else Some(load(path))
    }
    if (grids.isEmpty) None
    else if (grids.length == 1) Some(grids.head)
    else Some(Grid(grids.iterator.flatMap(_.subGrids).toVector, spec))
  }
}
