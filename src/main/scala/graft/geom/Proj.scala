package graft.geom

/**
 * Projected-CRS registry beyond Mercator/UTM (reference: proj/functions.cpp
 * delegates to PROJ's full embedded proj.db; we embed the projection math for
 * the widely-used kernel families plus a compact parameter table of common
 * EPSG codes instead, from the published formulas in Snyder, "Map Projections
 * — A Working Manual" (USGS PP 1395) and EPSG Guidance Note 7-2; parameter
 * values are from the public EPSG dataset).
 *
 * Kernels: Lambert Conformal Conic 2SP, Albers Equal-Area, Lambert Azimuthal
 * Equal-Area, Polar Stereographic (B), Transverse Mercator (Krüger series,
 * arbitrary ellipsoid/origin/scale), ellipsoidal Mercator, cylindrical
 * equal-area. Datums: GRS80/WGS84-equivalent frames (RGF93, ETRS89, NAD83,
 * GDA94/GDA2020, JGD2000/2011, SIRGAS2000, NZGD2000, Korea 2000 — identical
 * to WGS84 at the sub-meter level by definition) need no shift; legacy datums
 * with well-published 7-parameter Helmert transformations (OSGB36, TM75,
 * ED50) go through an ECEF position-vector shift (EPSG method 9606, meter-
 * level accuracy — the same fallback PROJ uses without distortion grids).
 * Legacy datums with no reliable Helmert (NAD27 — needs NADCON grids) stay
 * deliberately unregistered rather than silently wrong.
 */
object Proj {

  /** forward: lon/lat degrees (on the CRS's own datum) → projected x/y;
   *  inverse: the reverse. */
  trait Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }
  val Wgs84 = Ellipsoid(6378137.0, 298.257223563)
  val Grs80 = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830 = Ellipsoid(6377563.396, 299.3249646)
  val AiryModified = Ellipsoid(6377340.189, 299.3249646)
  val Intl1924 = Ellipsoid(6378388.0, 297.0)
  val Clarke1866 = Ellipsoid(6378206.4, 294.9786982)
  val Everest1967 = Ellipsoid(6377298.556, 300.8017) // Everest 1830 (1967 Definition)
  val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
  val Grs67 = Ellipsoid(6378160.0, 298.247167427)
  /** Clarke 1866 Authalic Sphere (EPSG:7052) — the US National Atlas grids. */
  val Sphere6370997 = Ellipsoid(6370997.0, Double.PositiveInfinity)
  /** WGS 72 (EPSG:7043) — the pre-1984 satellite datum's ellipsoid. */
  val Wgs72El = Ellipsoid(6378135.0, 298.26)
  /** GRS 1967 Modified / Australian National (EPSG 7050/7003): 1/f truncated
   *  to 298.25 — the SAD69 and AGD ellipsoid. */
  val Grs67Mod = Ellipsoid(6378160.0, 298.25)
  val Krass1940 = Ellipsoid(6378245.0, 298.3) // Krassowsky 1940 (Pulkovo systems)
  /** Clarke 1880 (IGN): defined by a and b (6356515.0); rf = a/(a-b) */
  val Clarke1880Ign = Ellipsoid(6378249.2, 6378249.2 / (6378249.2 - 6356515.0))
  /** Clarke 1858 (EPSG 7007): defined in Clarke's feet — a = 20926348 ft,
   *  b = 20855233 ft at 0.3047972654 m/ft (the Trinidad 1903 ellipsoid). */
  val Clarke1858 = Ellipsoid(20926348 * 0.3047972654, 294.26067636926064)
  /** Everest 1830 (1937 Adjustment) (EPSG:7015) — India/Burma/Thailand/Ceylon
   *  legacy surveys (Indian 1954/1975, Kandawala). PROJ tag `evrst30`. */
  val Everest1937 = Ellipsoid(6377276.345, 300.8017)
  /** Everest 1830 Modified (EPSG:7018) — the Kertau 1968 ellipsoid (West
   *  Malaysia & Singapore). PROJ tag `evrst48`. */
  val Everest1948 = Ellipsoid(6377304.063, 300.8017)
  /** Everest 1830 (1975 Definition) (EPSG:7045) — Kalianpur 1975 (India). */
  val Everest1975 = Ellipsoid(6377299.151, 300.8017255)
  /** Helmert 1906 (EPSG:7020) — the Egypt 1907 ellipsoid. PROJ tag `helmert`. */
  val Helmert1906 = Ellipsoid(6378200.0, 298.3)
  /** Clarke 1880 (RGS) (EPSG:7012) — common across Middle East/Africa legacy
   *  datums (Arc 1960, Adindan, Minna, Nahrwan, PSD93). PROJ tag `clrk80`. */
  val Clarke1880Rgs = Ellipsoid(6378249.145, 293.465)
  /** Clarke 1880 (Arc) (EPSG:7013) — southern-Africa Arc datums (Cape,
   *  Arc 1950); 1/f differs from RGS in the 5th decimal. */
  val Clarke1880Arc = Ellipsoid(6378249.145, 293.4663077)

  // ------------------------------------------------------------------ datums

  /** 7-parameter Helmert shift to WGS84 — position-vector rotation convention
   *  (EPSG method 9606): translations in meters, rotations in arc-seconds,
   *  scale in parts-per-million. */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxAs: Double, ryAs: Double, rzAs: Double, dsPpm: Double) {
    private val s = 1.0 + dsPpm * 1e-6
    private val as = math.Pi / (180.0 * 3600.0)
    private val rx = rxAs * as; private val ry = ryAs * as; private val rz = rzAs * as
    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + s * (x - rz * y + ry * z),
      ty + s * (rz * x + y - rx * z),
      tz + s * (-ry * x + rx * y + z))
    /** inverse via transpose of the (orthogonal to first order) rotation */
    def unapply(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val u = (x - tx) / s; val v = (y - ty) / s; val w = (z - tz) / s
      (u + rz * v - ry * w, -rz * u + v + rx * w, ry * u - rx * v + w)
    }
  }

  /** Time-dependent Helmert (EPSG methods 1053/1056 re-expressed in the
   *  position-vector convention): 7 base parameters valid at the reference
   *  epoch `t0` plus 7 per-year rates. `at(t)` materializes the static
   *  Helmert for a coordinate epoch `t` (decimal years) — the form every
   *  plate-fixed national frame (GDA2020, NAD83-era, ETRF) publishes its
   *  relationship to the ITRF with. Rates are meters/yr, arc-seconds/yr,
   *  ppm/yr. */
  final case class TimeHelmert(base: Helmert, rates: Helmert, t0: Double) {
    def at(t: Double): Helmert = {
      val dt = t - t0
      if (dt == 0.0) base
      else Helmert(base.tx + rates.tx * dt, base.ty + rates.ty * dt, base.tz + rates.tz * dt,
        base.rxAs + rates.rxAs * dt, base.ryAs + rates.ryAs * dt, base.rzAs + rates.rzAs * dt,
        base.dsPpm + rates.dsPpm * dt)
    }
  }

  /** Geodetic datum: ellipsoid + optional Helmert to WGS84 (None = a modern
   *  WGS84-equivalent frame; no shift step). An NTv2 grid, when present,
   *  supersedes the Helmert (PROJ's `+nadgrids` > `+towgs84` precedence):
   *  the grid's target frame is taken as WGS84-equivalent (NAD83 ≈ WGS84),
   *  and the shift applies directly in lon/lat. A time-dependent shift
   *  (`tshift`) supersedes the static one when present: the WGS84 hub is
   *  read as ITRF2014 (they agree to ~cm, below this chain's resolution)
   *  and the Helmert is evaluated at the coordinate epoch — callers without
   *  an epoch get the frame's own reference epoch `t0`, i.e. the published
   *  definition alignment (GDA2020 ≡ ITRF2014@2020.0 → identity). */
  final case class Datum(el: Ellipsoid, shift: Option[Helmert],
                         grid: Option[NtV2.Grid] = None,
                         tshift: Option[TimeHelmert] = None) {
    private def shiftAt(epoch: Option[Double]): Option[Helmert] = tshift match {
      case Some(th) =>
        // an evaluated all-zero Helmert is the published identity (a frame at
        // its own definition epoch): skip the ECEF round trip entirely so the
        // alignment is exact, not merely sub-mm
        Some(th.at(epoch.getOrElse(th.t0))).filter(_ != Helmert(0, 0, 0, 0, 0, 0, 0))
      case None => shift
    }
    def toWgs84(lonDeg: Double, latDeg: Double): (Double, Double) =
      toWgs84(lonDeg, latDeg, None)
    def toWgs84(lonDeg: Double, latDeg: Double, epoch: Option[Double]): (Double, Double) = grid match {
      case Some(g) => g.forward(lonDeg, latDeg)
      case None => shiftAt(epoch) match {
        case None => (lonDeg, latDeg)
        case Some(h) =>
          val (x, y, z) = geodeticToEcef(el, lonDeg, latDeg)
          val (x2, y2, z2) = h(x, y, z)
          ecefToGeodetic(Wgs84, x2, y2, z2)
      }
    }
    def fromWgs84(lonDeg: Double, latDeg: Double): (Double, Double) =
      fromWgs84(lonDeg, latDeg, None)
    def fromWgs84(lonDeg: Double, latDeg: Double, epoch: Option[Double]): (Double, Double) = grid match {
      case Some(g) => g.inverse(lonDeg, latDeg)
      case None => shiftAt(epoch) match {
        case None => (lonDeg, latDeg)
        case Some(h) =>
          val (x, y, z) = geodeticToEcef(Wgs84, lonDeg, latDeg)
          val (x2, y2, z2) = h.unapply(x, y, z)
          ecefToGeodetic(el, x2, y2, z2)
      }
    }
  }
  val DatumWgs84 = Datum(Wgs84, None)
  val DatumGrs80 = Datum(Grs80, None)
  /** GDA2020 ↔ ITRF2014(t): EPSG:8049 published with zero parameters at
   *  epoch 2020.0 and pure rotation rates (1.50379, 1.18346, 1.20716) mas/yr
   *  in the coordinate-frame convention — the Australian-plate Euler motion.
   *  Stored here as the INVERSE direction (GDA2020 → ITRF2014) in the
   *  position-vector convention, which flips the sign twice: CF→PV negates,
   *  inverting negates again, so the arc-second/yr rates carry the published
   *  sign. Without a coordinate epoch the shift evaluates at 2020.0 =
   *  identity (GDA2020 ≡ ITRF2014@2020.0 by definition). */
  val DatumGda2020 = Datum(Grs80, None, tshift = Some(TimeHelmert(
    base = Helmert(0, 0, 0, 0, 0, 0, 0),
    rates = Helmert(0, 0, 0, 0.00150379, 0.00118346, 0.00120716, 0),
    t0 = 2020.0)))
  /** OSGB36 → WGS84 (published single-Helmert, ~2 m vs the OSTN15 grid) */
  val DatumOsgb36 = Datum(Airy1830, Some(Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)))
  /** Ireland 1965 / TM75 → WGS84 */
  val DatumTm75 = Datum(AiryModified, Some(Helmert(482.530, -130.596, 564.557, -1.042, -0.214, -0.631, 8.150)))
  /** ED50 → WGS84 (mean-European 3-parameter shift) */
  val DatumEd50 = Datum(Intl1924, Some(Helmert(-87.0, -98.0, -121.0, 0, 0, 0, 0)))
  /** Timbalai 1948 → WGS84 (published 3-parameter shift, ~10 m class) */
  val DatumTimbalai = Datum(Everest1967, Some(Helmert(-679.0, 669.0, -48.0, 0, 0, 0, 0)))
  /** CH1903/CH1903+ → WGS84 (published swisstopo 3-parameter shift) */
  val DatumCh1903 = Datum(Bessel1841, Some(Helmert(674.374, 15.056, 405.346, 0, 0, 0, 0)))
  /** S-JTSK → WGS84 (published 7-parameter transformation) */
  val DatumSjtsk = Datum(Bessel1841, Some(Helmert(570.8, 85.7, 462.84, 4.998, 1.587, 5.261, 3.56)))
  /** HD72 → WGS84 (published 3-parameter shift) */
  val DatumHd72 = Datum(Grs67, Some(Helmert(52.17, -71.82, -14.9, 0, 0, 0, 0)))
  /** Amersfoort → WGS84 (published 7-parameter transformation) */
  val DatumAmersfoort = Datum(Bessel1841,
    Some(Helmert(565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725)))
  /** Trinidad 1903 → WGS84 (published 3-parameter shift) */
  val DatumTrinidad = Datum(Clarke1858, Some(Helmert(-61.702, 284.488, 472.052, 0, 0, 0, 0)))
  /** SAD69 → WGS84 (published mean 3-parameter shift for Brazil) */
  val DatumSad69 = Datum(Grs67Mod, Some(Helmert(-57.0, 1.0, -41.0, 0, 0, 0, 0)))
  /** Guam 1963 → WGS84 (published 3-parameter shift) */
  val DatumGuam = Datum(Clarke1866, Some(Helmert(-100.0, -248.0, 259.0, 0, 0, 0, 0)))
  /** DHDN (Rauenberg/Potsdam) → WGS84 — EPSG:1777 7-parameter (~3 m class) */
  val DatumDhdn = Datum(Bessel1841, Some(Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)))
  /** MGI (Austria) → WGS84 — EPSG:1618 7-parameter */
  val DatumMgi = Datum(Bessel1841, Some(Helmert(577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)))
  /** MGI 1901 (former Yugoslavia / Balkans realization) → WGS84 — published
   *  3-parameter shift (682, -203, 480), ~5 m class. A DIFFERENT datum
   *  realization from Austrian MGI: the translation vectors differ by
   *  ~300 m, so the Balkans Gauss-Krüger zones must not reuse DatumMgi. */
  val DatumMgi1901 = Datum(Bessel1841, Some(Helmert(682.0, -203.0, 480.0, 0, 0, 0, 0)))
  /** GGRS87 → WGS84 — EPSG:1272 3-parameter */
  val DatumGgrs87 = Datum(Grs80, Some(Helmert(-199.87, 74.79, 246.62, 0, 0, 0, 0)))
  /** Tokyo → WGS84 — the published 3-parameter shift (PROJ datum catalog;
   *  EPSG Japan-area geocentric translations). JGD2000 replaced Tokyo in
   *  2002; legacy Japanese data still carries it. */
  val DatumTokyo = Datum(Bessel1841, Some(Helmert(-146.414, 507.337, 680.507, 0, 0, 0, 0)))
  /** PSAD56 (Provisional South American 1956) → WGS84 — the published
   *  continent-mean 3-parameter shift (same ~accuracy class as the NAD27
   *  CONUS mean: country-specific vectors differ by tens of meters). */
  val DatumPsad56 = Datum(Intl1924, Some(Helmert(-288.0, 175.0, -376.0, 0, 0, 0, 0)))
  /** Dealul Piscului 1970 (Romania, S-42-derived) → WGS84 — the published
   *  3-parameter shift. EPSG:3844's Pulkovo 1942(58) realization differs
   *  from this by meters; both codes route here at this chain's accuracy
   *  class (noted like the NAD27 mean). */
  val DatumDealul70 = Datum(Krass1940, Some(Helmert(28.0, -121.0, -77.0, 0, 0, 0, 0)))
  /** WGS 72 → WGS 84 — the published defining transformation (EPSG:1237):
   *  dz +4.5 m, rz +0.554", ds +0.2263 ppm. */
  val DatumWgs72 = Datum(Wgs72El, Some(Helmert(0, 0, 4.5, 0, 0, 0.554, 0.2263)))
  /** KKJ (Finland) → WGS84 — the published national 7-parameter set. */
  val DatumKkj = Datum(Intl1924,
    Some(Helmert(-96.062, -82.428, -121.753, 4.801, 0.345, -1.376, 1.496)))
  /** RT90 (Sweden) → WGS84 — the Lantmäteriet-published 7-parameter set. */
  val DatumRt90 = Datum(Bessel1841,
    Some(Helmert(414.1, 41.3, 603.1, -0.855, 2.141, -7.023, 0)))
  /** NZGD49 → WGS84 — the LINZ-published 7-parameter set. */
  val DatumNzgd49 = Datum(Intl1924,
    Some(Helmert(59.47, -5.04, 187.44, 0.47, -0.1, 1.024, -4.5993)))
  /** Datum 73 (Portugal) → WGS84 — published 3-parameter shift. */
  val DatumD73 = Datum(Intl1924, Some(Helmert(-223.237, 110.193, 36.649, 0, 0, 0, 0)))
  /** Ain el Abd 1970 (Saudi Arabia vector) → WGS84 — published 3-parameter. */
  val DatumAinElAbd = Datum(Intl1924, Some(Helmert(-143, -236, 7, 0, 0, 0, 0)))
  // ----- batch-7 datums (round 11): SE/South Asia, Middle East, Africa, Italy.
  // All towgs84 sets are the published EPSG/PROJ country-mean parameters;
  // 3-parameter sets are ~5-25 m class by construction (like NAD27/PSAD56
  // above), 7-parameter sets are the national adopted transformations.
  /** Indian 1954 (Myanmar/Thailand) → WGS84 — published 3-parameter. */
  val DatumIndian1954 = Datum(Everest1937, Some(Helmert(217, 823, 299, 0, 0, 0, 0)))
  /** Indian 1975 (Thailand) → WGS84 — published 3-parameter. */
  val DatumIndian1975 = Datum(Everest1937, Some(Helmert(210, 814, 289, 0, 0, 0, 0)))
  /** Kalianpur 1975 (India) → WGS84 — published 3-parameter. */
  val DatumKalianpur75 = Datum(Everest1975, Some(Helmert(295, 736, 257, 0, 0, 0, 0)))
  /** Kandawala (Sri Lanka) → WGS84 — published 3-parameter. */
  val DatumKandawala = Datum(Everest1937, Some(Helmert(-97, 787, 86, 0, 0, 0, 0)))
  /** VN-2000 (Vietnam) → WGS84 — the national decree 7-parameter set
   *  (position-vector), sub-meter class. */
  val DatumVn2000 = Datum(Wgs84, Some(Helmert(-191.90441429, -39.30318279, -111.45032835,
    -0.00928836, 0.01975479, -0.00427372, 0.252906278)))
  /** Kertau 1968 (West Malaysia & Singapore) → WGS84 — published 3-parameter. */
  val DatumKertau = Datum(Everest1948, Some(Helmert(-11, 851, 5, 0, 0, 0, 0)))
  /** Batavia / Genuk (Java) → WGS84 — published 3-parameter. */
  val DatumBatavia = Datum(Bessel1841, Some(Helmert(-377, 681, -50, 0, 0, 0, 0)))
  /** DGN95 (Indonesia) — an ITRF realization, WGS84-equivalent at this
   *  chain's class (like SIRGAS/NZGD2000). */
  val DatumDgn95 = Datum(Grs80, None)
  /** PRS92 (Philippines) → WGS84 — the published national 7-parameter set. */
  val DatumPrs92 = Datum(Clarke1866,
    Some(Helmert(-127.62, -67.24, -47.04, -3.068, 4.903, 1.578, -1.06)))
  /** PSD93 (Oman) → WGS84 — the published national 7-parameter set. */
  val DatumPsd93 = Datum(Clarke1880Rgs,
    Some(Helmert(-180.624, -225.516, 173.919, -0.81, -1.898, 8.336, 16.71006)))
  /** Qatar 1974 → WGS84 — published 3-parameter. */
  val DatumQatar74 = Datum(Intl1924, Some(Helmert(-128.16, -282.42, 21.93, 0, 0, 0, 0)))
  /** Nahrwan 1967 (UAE / Qatar offshore) → WGS84 — published 3-parameter. */
  val DatumNahrwan67 = Datum(Clarke1880Rgs, Some(Helmert(-243, -192, 477, 0, 0, 0, 0)))
  /** Arc 1950 (Botswana/Zimbabwe/Zambia…) → WGS84 — published mean 3-parameter. */
  val DatumArc1950 = Datum(Clarke1880Arc, Some(Helmert(-143, -90, -294, 0, 0, 0, 0)))
  /** Arc 1960 (Kenya/Tanzania/Uganda) → WGS84 — published mean 3-parameter. */
  val DatumArc1960 = Datum(Clarke1880Rgs, Some(Helmert(-160, -6, -302, 0, 0, 0, 0)))
  /** Adindan (Sudan/Ethiopia) → WGS84 — published mean 3-parameter. */
  val DatumAdindan = Datum(Clarke1880Rgs, Some(Helmert(-166, -15, 204, 0, 0, 0, 0)))
  /** Egypt 1907 → WGS84 — published 3-parameter. */
  val DatumEgypt1907 = Datum(Helmert1906, Some(Helmert(-130, 110, -13, 0, 0, 0, 0)))
  /** Minna (Nigeria) → WGS84 — published mean 3-parameter. */
  val DatumMinna = Datum(Clarke1880Rgs, Some(Helmert(-92, -93, 122, 0, 0, 0, 0)))
  /** Cape (South Africa pre-Hartebeesthoek) → WGS84 — published 3-parameter. */
  val DatumCape = Datum(Clarke1880Arc, Some(Helmert(-136, -108, -292, 0, 0, 0, 0)))
  /** Nord Sahara 1959 (Algeria) → WGS84 — published mean 3-parameter. */
  val DatumNordSahara = Datum(Clarke1880Rgs, Some(Helmert(-186, -93, 310, 0, 0, 0, 0)))
  /** Carthage (Tunisia) → WGS84 — published 3-parameter. */
  val DatumCarthage = Datum(Clarke1880Ign, Some(Helmert(-263, 6, 431, 0, 0, 0, 0)))
  /** Merchich (Morocco) → WGS84 — published 3-parameter. */
  val DatumMerchich = Datum(Clarke1880Ign, Some(Helmert(31, 146, 47, 0, 0, 0, 0)))
  /** Monte Mario / Rome 1940 (Italy) → WGS84 — the IGM 7-parameter set. */
  val DatumMonteMario = Datum(Intl1924,
    Some(Helmert(-104.1, -49.1, -9.9, 0.971, -2.917, 0.714, -11.68)))

  // ----- batch-8 datums (round 11): South America, Indonesia, Levant.
  /** Indonesian National Spheroid (EPSG:7021). */
  val IndonesianNs = Ellipsoid(6378160.0, 298.247)
  /** ID74 (Indonesia 1974) → WGS84 — published 3-parameter. */
  val DatumId74 = Datum(IndonesianNs, Some(Helmert(-24, -15, 5, 0, 0, 0, 0)))
  /** Bogota 1975 (Colombia) → WGS84 — published 3-parameter. */
  val DatumBogota = Datum(Intl1924, Some(Helmert(307, 304, -318, 0, 0, 0, 0)))
  /** Campo Inchauspe (Argentina pre-POSGAR) → WGS84 — published mean 3-parameter. */
  val DatumCampo = Datum(Intl1924, Some(Helmert(-148, 136, 90, 0, 0, 0, 0)))
  /** Clarke 1880 (Benoit) (EPSG:7010) — defined by a and b. */
  val Clarke1880Benoit = Ellipsoid(6378300.789, 6378300.789 / (6378300.789 - 6356566.435))
  /** Palestine 1923 → WGS84 — published 3-parameter. */
  val DatumPalestine = Datum(Clarke1880Benoit, Some(Helmert(-275.722, 94.7824, 340.8944, 0, 0, 0, 0)))
  /** GRS 1980 Authalic Sphere (EPSG:7048); like the US National Atlas
   *  sphere, the sphere itself is the approximation — no shift. */
  val SphereGrs80Authalic = Ellipsoid(6371007.0, Double.PositiveInfinity)
  val DatumGrs80Sphere = Datum(SphereGrs80Authalic, None)
  /** The US National Atlas authalic sphere carries no shift (the sphere
   *  itself is the approximation — PROJ publishes towgs84=0,0,0 for it). */
  val DatumAtlasSphere = Datum(Sphere6370997, None)

  // ----- batch-9 datums (round 12): China legacy frames, EASE-Grid sphere.
  /** Beijing 1954 → WGS84 — published 3-parameter mean (same LOUD accuracy
   *  note as [[DatumPulkovo42]]: the EPSG dataset carries province-wise
   *  refinements; this is the ~10 m class national mean). */
  val DatumBeijing54 = Datum(Krass1940, Some(Helmert(15.8, -154.4, -82.3, 0, 0, 0, 0)))
  /** IAG 1975 ellipsoid (EPSG:7049) — Xian 1980. */
  val Iag1975 = Ellipsoid(6378140.0, 298.257)
  /** Xian 1980: the EPSG dataset publishes no national Helmert to WGS84
   *  (grid/region-based only); PROJ likewise ships a null transform when no
   *  grid is configured — mirrored here (positional class ~100 m, exactly
   *  PROJ's no-grid default). */
  val DatumXian80 = Datum(Iag1975, None)
  /** International 1924 Authalic Sphere (EPSG:7057) — the original NSIDC
   *  EASE-Grid sphere; like the other authalic spheres, no shift. */
  val SphereIntl1924Authalic = Ellipsoid(6371228.0, Double.PositiveInfinity)
  val DatumIntl1924Sphere = Datum(SphereIntl1924Authalic, None)
  /** New Beijing (the 1954 network readjustment, EPSG:1045): like Xian 1980,
   *  the EPSG dataset publishes no national Helmert to WGS84 and PROJ ships
   *  a null transform without grids — mirrored here. */
  val DatumNewBeijing = Datum(Krass1940, None)
  /** Belgian Datum 72 → WGS84 — EPSG:15929 7-parameter */
  val DatumBd72 = Datum(Intl1924,
    Some(Helmert(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747)))
  /** NTF (France) → WGS84 — published 3-parameter shift (-168,-60,320), ~2 m */
  val DatumNtf = Datum(Clarke1880Ign, Some(Helmert(-168.0, -60.0, 320.0, 0, 0, 0, 0)))
  /** Pulkovo 1942 → WGS84 — EPSG:1254 3-parameter mean shift; LOUD accuracy
   *  note: regional realizations differ by up to ~10 m (the reference's
   *  proj.db picks per-country variants; this is the documented mean) */
  val DatumPulkovo42 = Datum(Krass1940, Some(Helmert(28.0, -130.0, -95.0, 0, 0, 0, 0)))
  /** NAD27 → WGS84 — published CONUS-mean 3-parameter shift (EPSG:1173 class,
   *  ~10 m). High-accuracy NAD27 work routes through the NADCON grids
   *  instead (`+nadgrids=conus.las`, Nadcon.scala) — same stance as PROJ
   *  when no grid is available. */
  val DatumNad27 = Datum(Clarke1866, Some(Helmert(-8.0, 160.0, 176.0, 0, 0, 0, 0)))
  /** AGD66 → GDA94 national 7-parameter sets (ICSM GDA Technical Manual,
   *  ~1 m class; GDA94 ≡ WGS84 at this accuracy). Ellipsoid: Australian
   *  National Spheroid. */
  val DatumAgd66 = Datum(Grs67Mod, Some(Helmert(-117.808, -51.536, 137.784, 0.303, 0.446, 0.234, -0.290)))
  val DatumAgd84 = Datum(Grs67Mod, Some(Helmert(-117.763, -51.510, 139.061, 0.292, 0.443, 0.277, -0.191)))
  /** Hong Kong 1980 → WGS84 — the published 7-parameter set (EPSG tfm
   *  class, sub-m over the territory) */
  val DatumHk80 = Datum(Intl1924,
    Some(Helmert(-162.619, -276.959, -161.764, 0.067753, -2.243649, -1.158827, -1.094246)))
  /** Israel 1993 → WGS84 — published geocentric translations (~5 m class) */
  val DatumIsrael93 = Datum(Grs80, Some(Helmert(-48.0, 55.0, 52.0, 0, 0, 0, 0)))
  /** Luxembourg 1930 → WGS84 — published 7-parameter set */
  val DatumLux30 = Datum(Intl1924,
    Some(Helmert(-189.681, 18.3463, -42.7695, -0.33746, -3.09264, 2.53861, 0.4598)))

  // ----- batch-12 datums (round 14): Levant/Madagascar/West Africa residue,
  // British West Indies island datums, Jamaica, Pacific SIRGAS-class frames.
  /** Tananarive 1925 (Madagascar) → WGS84 — published 3-parameter. */
  val DatumTananarive = Datum(Intl1924, Some(Helmert(-189, -242, -91, 0, 0, 0, 0)))
  /** Leigon (Ghana) → WGS84 — published 3-parameter. */
  val DatumLeigon = Datum(Clarke1880Rgs, Some(Helmert(-130, 29, 364, 0, 0, 0, 0)))
  /** Locodjo 1965 (Côte d'Ivoire, IGN) → WGS84 — published 3-parameter. */
  val DatumLocodjo = Datum(Clarke1880Rgs, Some(Helmert(-125, 53, 467, 0, 0, 0, 0)))
  /** Abidjan 1987 (Côte d'Ivoire readjustment) → WGS84 — published 3-parameter. */
  val DatumAbidjan = Datum(Clarke1880Rgs, Some(Helmert(-124.76, 53.0, 466.79, 0, 0, 0, 0)))
  /** Deir ez Zor (Syria/Lebanon Levant grids) → WGS84 — published 3-parameter. */
  val DatumDeirEzZor = Datum(Clarke1880Ign, Some(Helmert(-190.421, 8.532, 238.69, 0, 0, 0, 0)))
  /** British West Indies island datums → WGS84 — the published per-island
   *  3-parameter shifts (single-station class, ~10-25 m). All on
   *  Clarke 1880 (RGS); all carry the shared BWI Grid TM conversion. */
  val DatumAntigua43 = Datum(Clarke1880Rgs, Some(Helmert(-270, 13, 62, 0, 0, 0, 0)))
  val DatumDominica45 = Datum(Clarke1880Rgs, Some(Helmert(725, 685, 536, 0, 0, 0, 0)))
  val DatumGrenada53 = Datum(Clarke1880Rgs, Some(Helmert(72, 213.7, 93, 0, 0, 0, 0)))
  val DatumMontserrat58 = Datum(Clarke1880Rgs, Some(Helmert(174, 359, 365, 0, 0, 0, 0)))
  val DatumStKitts55 = Datum(Clarke1880Rgs, Some(Helmert(9, 183, 236, 0, 0, 0, 0)))
  val DatumStLucia55 = Datum(Clarke1880Rgs, Some(Helmert(-149, 128, 296, 0, 0, 0, 0)))
  val DatumStVincent45 = Datum(Clarke1880Rgs, Some(Helmert(195.671, 332.268, 274.465, 0, 0, 0, 0)))
  /** JAD69 (Jamaica 1969) → WGS84 — published 3-parameter. */
  val DatumJad69 = Datum(Clarke1866, Some(Helmert(70, 207, 389.5, 0, 0, 0, 0)))
  /** Fiji Geodetic Datum 1986: defined on the WGS 72 ellipsoid; treated as
   *  WGS84-aligned at this chain's class (the WGS72→WGS84 frame offset is
   *  ~5 m — below the island datums' single-station accuracy class; the
   *  ellipsoid difference IS carried exactly). */
  val DatumFiji86 = Datum(Wgs72El, None)

  // ----- batch-13 datums (round 15): NE/Equatorial-Africa residue, Barbados,
  // the Ocotepeque 1935 Central-America family, Bermuda. All published
  // 3-parameter shifts from the public EPSG dataset (single-network class,
  // ~5-25 m — the same accuracy tier PROJ ships for these frames).
  /** Massawa (Eritrea) → WGS84 — published 3-parameter. */
  val DatumMassawa = Datum(Bessel1841, Some(Helmert(639, 405, 60, 0, 0, 0, 0)))
  /** Pointe Noire 1948 (Congo) → WGS84 — published 3-parameter. */
  val DatumPointeNoire = Datum(Clarke1880Ign, Some(Helmert(-148, 51, -291, 0, 0, 0, 0)))
  /** M'poraloko (Gabon) → WGS84 — published 3-parameter. */
  val DatumMporaloko = Datum(Clarke1880Ign, Some(Helmert(-74, -130, 42, 0, 0, 0, 0)))
  /** Barbados 1938 → WGS84 — published 3-parameter. */
  val DatumBarbados38 = Datum(Clarke1880Rgs, Some(Helmert(31.95, 300.99, 419.19, 0, 0, 0, 0)))
  /** Ocotepeque 1935 (Central America) → WGS84 — published 3-parameter. */
  val DatumOcotepeque = Datum(Clarke1866, Some(Helmert(205, 96, -98, 0, 0, 0, 0)))
  /** Bermuda 1957 → WGS84 — published 3-parameter. */
  val DatumBermuda57 = Datum(Clarke1866, Some(Helmert(-73, 213, 296, 0, 0, 0, 0)))

  // ----- batch-14 datums (round 16): Indochina + Brazil legacy residue for
  // the systematic UTM-block expansion. Published 3-parameter shifts.
  /** Indian 1960 (Vietnam, Con Son) → WGS84 — published 3-parameter. */
  val DatumIndian1960 = Datum(Everest1937, Some(Helmert(198, 881, 317, 0, 0, 0, 0)))
  /** Corrego Alegre 1970-72 (Brazil pre-SAD69) → WGS84 — published 3-parameter. */
  val DatumCorrego = Datum(Intl1924, Some(Helmert(-205.57, 168.77, -4.12, 0, 0, 0, 0)))

  private def geodeticToEcef(el: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val n = el.a / math.sqrt(1 - el.e2 * sinLat * sinLat)
    (n * cosLat * math.cos(lon), n * cosLat * math.sin(lon), n * (1 - el.e2) * sinLat)
  }
  private def ecefToGeodetic(el: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val p = math.sqrt(x * x + y * y)
    var lat = math.atan2(z, p * (1 - el.e2))
    var i = 0
    while (i < 10) {
      val sinLat = math.sin(lat)
      val n = el.a / math.sqrt(1 - el.e2 * sinLat * sinLat)
      val h = p / math.cos(lat) - n
      val next = math.atan2(z, p * (1 - el.e2 * n / (n + h)))
      if (math.abs(next - lat) < 1e-13) { lat = next; i = 10 } else { lat = next; i += 1 }
    }
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(lat))
  }

  // -------------------------------------------------------- shared helpers
  // (Snyder 14-15, 15-9, 3-12)
  private def mFn(el: Ellipsoid, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))
  private def tFn(el: Ellipsoid, phi: Double): Double = {
    val esin = el.e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), el.e / 2)
  }
  private def qFn(el: Ellipsoid, phi: Double): Double = {
    val sinPhi = math.sin(phi)
    if (el.e2 < 1e-12) return 2 * sinPhi // spherical limit (q → 2 sin φ)
    val esin = el.e * sinPhi
    (1 - el.e2) * (sinPhi / (1 - esin * esin) - (1 / (2 * el.e)) * math.log((1 - esin) / (1 + esin)))
  }
  /** latitude from isometric parameter t by fixed-point iteration (Snyder 7-9) */
  private def phiFromT(el: Ellipsoid, t: Double): Double = {
    var phi = math.Pi / 2 - 2 * math.atan(t)
    var i = 0
    while (i < 15) {
      val esin = el.e * math.sin(phi)
      val next = math.Pi / 2 - 2 * math.atan(t * math.pow((1 - esin) / (1 + esin), el.e / 2))
      if (math.abs(next - phi) < 1e-14) return next
      phi = next; i += 1
    }
    phi
  }
  /** latitude from authalic q by Newton iteration (Snyder 3-16) */
  private def phiFromQ(el: Ellipsoid, q: Double): Double = {
    val qp = qFn(el, math.Pi / 2)
    if (math.abs(math.abs(q) - qp) < 1e-12) return math.signum(q) * math.Pi / 2
    // spherical limit: q = 2 sin φ exactly, no iteration (and 3-16 divides by e)
    if (el.e2 < 1e-12) return math.asin(math.max(-1, math.min(1, q / 2)))
    var phi = math.asin(q / 2)
    var i = 0
    while (i < 15) {
      val sinPhi = math.sin(phi); val esin = el.e * sinPhi
      // Snyder 3-16 iteration
      val dPhi = (1 - esin * esin) * (1 - esin * esin) / (2 * math.cos(phi)) *
        (q / (1 - el.e2) - sinPhi / (1 - esin * esin) + (1 / (2 * el.e)) * math.log((1 - esin) / (1 + esin)))
      phi += dPhi
      if (math.abs(dPhi) < 1e-14) return phi
      i += 1
    }
    phi
  }

  /** Lambert Conformal Conic, 2 standard parallels (EPSG method 9802 /
   *  Snyder 15-1..15-11). */
  final class Lcc2SP(el: Ellipsoid, phi1Deg: Double, phi2Deg: Double,
                     phiFDeg: Double, lamFDeg: Double, fe: Double, fn: Double)
      extends Projection {
    private val phi1 = math.toRadians(phi1Deg)
    private val phi2 = math.toRadians(phi2Deg)
    private val phiF = math.toRadians(phiFDeg)
    private val lamF = math.toRadians(lamFDeg)
    private val n = (math.log(mFn(el, phi1)) - math.log(mFn(el, phi2))) /
      (math.log(tFn(el, phi1)) - math.log(tFn(el, phi2)))
    private val bigF = mFn(el, phi1) / (n * math.pow(tFn(el, phi1), n))
    private val rF = el.a * bigF * math.pow(tFn(el, phiF), n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val r = el.a * bigF * math.pow(tFn(el, phi), n)
      val theta = n * (math.toRadians(lonDeg) - lamF)
      (fe + r * math.sin(theta), fn + rF - r * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rF - (y - fn)
      val r = math.signum(n) * math.sqrt(dx * dx + dy * dy)
      // southern aspect (n < 0): dx, dy, rF all carry flipped signs, so the
      // polar angle comes from the reversed vector (Snyder p.107, same note
      // as the Albers kernel below)
      val theta = if (n >= 0) math.atan2(dx, dy) else math.atan2(-dx, -dy)
      val t = math.pow(r / (el.a * bigF), 1 / n)
      (math.toDegrees(lamF + theta / n), math.toDegrees(phiFromT(el, t)))
    }
  }

  /** Albers Equal-Area Conic (EPSG method 9822 / Snyder 14-1..14-12). */
  /** LCC with one standard parallel (EPSG 9801, Snyder 15-1..15-5):
   *  n = sin φ0 (the 2SP limit as both parallels meet φ0), scale k0 at the
   *  single parallel. Used by the NTF Lambert zones. */
  final class Lcc1SP(el: Ellipsoid, phi0Deg: Double, lam0Deg: Double, k0: Double,
                     fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(phi0Deg)
    private val lam0 = math.toRadians(lam0Deg)
    private val n = math.sin(phi0)
    private val bigF = k0 * mFn(el, phi0) / (n * math.pow(tFn(el, phi0), n))
    private val r0 = el.a * bigF * math.pow(tFn(el, phi0), n)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val r = el.a * bigF * math.pow(tFn(el, math.toRadians(latDeg)), n)
      val theta = n * (math.toRadians(lonDeg) - lam0)
      (fe + r * math.sin(theta), fn + r0 - r * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = r0 - (y - fn)
      val r = math.signum(n) * math.sqrt(dx * dx + dy * dy)
      val theta = if (n >= 0) math.atan2(dx, dy) else math.atan2(-dx, -dy)
      val t = math.pow(r / (el.a * bigF), 1 / n)
      (math.toDegrees(lam0 + theta / n), math.toDegrees(phiFromT(el, t)))
    }
  }

  final class Albers(el: Ellipsoid, phi1Deg: Double, phi2Deg: Double,
                     phi0Deg: Double, lam0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val phi1 = math.toRadians(phi1Deg)
    private val phi2 = math.toRadians(phi2Deg)
    private val phi0 = math.toRadians(phi0Deg)
    private val lam0 = math.toRadians(lam0Deg)
    private val m1 = mFn(el, phi1); private val m2 = mFn(el, phi2)
    private val q1 = qFn(el, phi1); private val q2 = qFn(el, phi2)
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private val rho0 = el.a * math.sqrt(c - n * qFn(el, phi0)) / n

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val rho = el.a * math.sqrt(c - n * qFn(el, phi)) / n
      val theta = n * (math.toRadians(lonDeg) - lam0)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rho0 - (y - fn)
      val rho = math.sqrt(dx * dx + dy * dy)
      // southern aspect (n < 0): x, y, rho0 all carry flipped signs, so the
      // polar angle comes from the reversed vector (Snyder p.102 note)
      val theta = if (n >= 0) math.atan2(dx, dy) else math.atan2(-dx, -dy)
      val q = (c - rho * rho * n * n / (el.a * el.a)) / n
      (math.toDegrees(lam0 + theta / n), math.toDegrees(phiFromQ(el, q)))
    }
  }

  /** Lambert Azimuthal Equal-Area, oblique/polar aspect (EPSG method 9820 /
   *  Snyder 24-2..24-14 via authalic latitudes). */
  final class Laea(el: Ellipsoid, phi0Deg: Double, lam0Deg: Double,
                   fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(phi0Deg)
    private val lam0 = math.toRadians(lam0Deg)
    private val qp = qFn(el, math.Pi / 2)
    private val rq = el.a * math.sqrt(qp / 2)
    private val polar = math.abs(phi0Deg) >= 90.0 - 1e-12
    private val north = phi0Deg > 0
    private val beta0 = math.asin(math.max(-1, math.min(1, qFn(el, phi0) / qp)))
    private val d = if (polar) 1.0 else el.a * mFn(el, phi0) / (rq * math.cos(beta0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
      if (polar) {
        // Snyder 24-23/24-25: polar aspect closed form
        val q = qFn(el, phi)
        val rho = el.a * math.sqrt(if (north) qp - q else qp + q)
        val dl = lam - lam0
        val x = fe + rho * math.sin(dl)
        val y = if (north) fn - rho * math.cos(dl) else fn + rho * math.cos(dl)
        return (x, y)
      }
      val beta = math.asin(math.max(-1, math.min(1, qFn(el, phi) / qp)))
      val b = rq * math.sqrt(2 / (1 + math.sin(beta0) * math.sin(beta) +
        math.cos(beta0) * math.cos(beta) * math.cos(lam - lam0)))
      val x = fe + b * d * math.cos(beta) * math.sin(lam - lam0)
      val y = fn + (b / d) * (math.cos(beta0) * math.sin(beta) -
        math.sin(beta0) * math.cos(beta) * math.cos(lam - lam0))
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) / d; val dy = (y - fn) * d
      val rho = math.sqrt(dx * dx + dy * dy)
      if (polar) {
        if (rho < 1e-12) return (math.toDegrees(lam0), if (north) 90.0 else -90.0)
        val q = if (north) qp - rho * rho / (el.a * el.a) else rho * rho / (el.a * el.a) - qp
        val lam = if (north) lam0 + math.atan2(dx, -dy) else lam0 + math.atan2(dx, dy)
        return (math.toDegrees(lam), math.toDegrees(phiFromQ(el, q)))
      }
      if (rho < 1e-12) return (math.toDegrees(lam0), math.toDegrees(phi0))
      val ce = 2 * math.asin(math.max(-1, math.min(1, rho / (2 * rq))))
      val beta = math.asin(math.cos(ce) * math.sin(beta0) + (dy * math.sin(ce) * math.cos(beta0) / rho))
      val lam = lam0 + math.atan2(dx * math.sin(ce),
        rho * math.cos(beta0) * math.cos(ce) - dy * math.sin(beta0) * math.sin(ce))
      val q = qp * math.sin(beta)
      (math.toDegrees(lam), math.toDegrees(phiFromQ(el, q)))
    }
  }

  /** Polar Stereographic variant B — latitude of true scale (EPSG method
   *  9829 / Snyder 21-x ellipsoidal). `north`: pole aspect. */
  final class PolarStereo(el: Ellipsoid, latTsDeg: Double, lon0Deg: Double,
                          fe: Double, fn: Double, north: Boolean) extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val tc = tFn(el, math.toRadians(math.abs(latTsDeg)))
    private val mc = mFn(el, math.toRadians(math.abs(latTsDeg)))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // south aspect: t_south(φ) = t_north(−φ)
      val t = tFn(el, math.toRadians(if (north) latDeg else -latDeg))
      val rho = el.a * mc * t / tc
      val theta = math.toRadians(lonDeg) - lam0
      if (north) (fe + rho * math.sin(theta), fn - rho * math.cos(theta))
      else (fe + rho * math.sin(theta), fn + rho * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = y - fn
      val rho = math.sqrt(dx * dx + dy * dy)
      val t = rho * tc / (el.a * mc)
      val phiAbs = phiFromT(el, t)
      val theta = if (north) math.atan2(dx, -dy) else math.atan2(dx, dy)
      val lat = if (north) phiAbs else -phiAbs
      (math.toDegrees(lam0 + theta), math.toDegrees(lat))
    }
  }

  /** Polar Stereographic variant A (EPSG 9810): scale factor k0 given AT the
   *  pole rather than via a standard parallel (variant B, above). UPS is
   *  this method with k0=0.994, FE=FN=2000000 (EPSG GN7-2 §3.2.3.1:
   *  ρ = 2·a·k0·t / √((1+e)^(1+e)·(1-e)^(1-e))). */
  final class PolarStereoA(el: Ellipsoid, k0: Double, lon0Deg: Double,
                           fe: Double, fn: Double, north: Boolean) extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val e = math.sqrt(el.e2)
    private val cf = math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val t = tFn(el, math.toRadians(if (north) latDeg else -latDeg))
      val rho = 2.0 * el.a * k0 * t / cf
      val theta = math.toRadians(lonDeg) - lam0
      if (north) (fe + rho * math.sin(theta), fn - rho * math.cos(theta))
      else (fe + rho * math.sin(theta), fn + rho * math.cos(theta))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = y - fn
      val rho = math.hypot(dx, dy)
      val t = rho * cf / (2.0 * el.a * k0)
      val phiAbs = phiFromT(el, t)
      val theta = if (north) math.atan2(dx, -dy) else math.atan2(dx, dy)
      (math.toDegrees(lam0 + theta), math.toDegrees(if (north) phiAbs else -phiAbs))
    }
  }

  /** Transverse Mercator on any ellipsoid via the Krüger series in Karney's
   *  2011 formulation (6th-order; sub-millimeter within ±10° of the central
   *  meridian). Generalizes [[Tm]] (fixed WGS84/UTM) to arbitrary origin,
   *  scale, and false offsets — the kernel behind state-plane TM zones,
   *  national grids (BNG, NZTM, SWEREF, …), and non-WGS84 UTM families. */
  final class TransMerc(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                        k0: Double, fe: Double, fn: Double) extends Projection {
    private val n = el.f / (2.0 - el.f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val bigA = el.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val alpha = Array(
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private val beta = Array(
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)
    private val delta = Array(
      2 * n - 2.0 / 3 * n2 - 2 * n3 + 116.0 / 45 * n4 + 26.0 / 45 * n5 - 2854.0 / 675 * n6,
      7.0 / 3 * n2 - 8.0 / 5 * n3 - 227.0 / 45 * n4 + 2704.0 / 315 * n5 + 2323.0 / 945 * n6,
      56.0 / 15 * n3 - 136.0 / 35 * n4 - 1262.0 / 105 * n5 + 73814.0 / 2835 * n6,
      4279.0 / 630 * n4 - 332.0 / 35 * n5 - 399572.0 / 14175 * n6,
      4174.0 / 315 * n5 - 144838.0 / 6237 * n6,
      601676.0 / 22275 * n6)
    private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
    private val twoSqrtN = 2 * math.sqrt(n) / (1 + n)

    private def xiEta(latDeg: Double, dLamRad: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinPhi = math.sin(phi)
      val t = math.sinh(atanh(sinPhi) - twoSqrtN * atanh(twoSqrtN * sinPhi))
      val xiP = math.atan2(t, math.cos(dLamRad))
      val etaP = atanh(math.sin(dLamRad) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (xi, eta)
    }
    /** meridian-arc northing of the natural-origin latitude */
    private val m0 = if (lat0Deg == 0) 0.0 else k0 * bigA * xiEta(lat0Deg, 0.0)._1

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      var dLam = lonDeg - lon0Deg
      if (dLam > 180) dLam -= 360 else if (dLam < -180) dLam += 360
      val (xi, eta) = xiEta(latDeg, math.toRadians(dLam))
      (fe + k0 * bigA * eta, fn + k0 * bigA * xi - m0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - fn + m0) / (k0 * bigA)
      val eta = (x - fe) / (k0 * bigA)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 6) { phi += delta(j - 1) * math.sin(2 * j * chi); j += 1 }
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (lon0Deg + math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Mercator, variant A with k0=1 (EPSG method 9804 /
   *  Snyder 7-6..7-8) — e.g. EPSG:3395 World Mercator. */
  final class MercatorEll(el: Ellipsoid, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      (fe + el.a * (math.toRadians(lonDeg) - lam0),
       fn - el.a * math.log(tFn(el, math.toRadians(latDeg))))
    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = math.exp(-(y - fn) / el.a)
      (math.toDegrees(lam0 + (x - fe) / el.a), math.toDegrees(phiFromT(el, t)))
    }
  }

  /** Projected CRS measured in non-meter units (US survey feet state-plane
   *  variants): wraps a meter-based kernel built with zero false offsets and
   *  applies the unit conversion + unit-denominated false offsets. */
  final class InUnits(inner: Projection, metersPerUnit: Double,
                      feUnits: Double, fnUnits: Double) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (x, y) = inner.forward(lonDeg, latDeg)
      (feUnits + x / metersPerUnit, fnUnits + y / metersPerUnit)
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      inner.inverse((x - feUnits) * metersPerUnit, (y - fnUnits) * metersPerUnit)
  }
  val UsFoot = 0.3048006096012192 // meters per US survey foot
  val ClarkeLink = 0.201166195164 // meters per Clarke's link (EPSG 9039)

  /** Cylindrical Equal Area, normal aspect (EPSG method 9835 / Snyder
   *  10-1..10-2 ellipsoidal) — e.g. EPSG:6933 EASE-Grid 2.0 Global. */
  final class Cea(el: Ellipsoid, latTsDeg: Double, lon0Deg: Double,
                  fe: Double, fn: Double) extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val k0 = mFn(el, math.toRadians(latTsDeg))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      (fe + el.a * k0 * (math.toRadians(lonDeg) - lam0),
       fn + el.a * qFn(el, math.toRadians(latDeg)) / (2 * k0))
    def inverse(x: Double, y: Double): (Double, Double) = {
      val q = 2 * (y - fn) * k0 / el.a
      (math.toDegrees(lam0 + (x - fe) / (el.a * k0)), math.toDegrees(phiFromQ(el, q)))
    }
  }

  // ------------------------------------------- meridian-arc based kernels

  /** Meridian arc length from the equator (Snyder 3-21). */
  private def meridianArc(el: Ellipsoid, phi: Double): Double = {
    val e2 = el.e2; val e4 = e2 * e2; val e6 = e4 * e2
    el.a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
      - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
      - (35 * e6 / 3072) * math.sin(6 * phi))
  }
  /** dM/dphi / a (Snyder 18-17) — the meridian-arc derivative series. */
  private def meridianArcPrime(el: Ellipsoid, phi: Double): Double = {
    val e2 = el.e2; val e4 = e2 * e2; val e6 = e4 * e2
    (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) -
      2 * (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.cos(2 * phi) +
      4 * (15 * e4 / 256 + 45 * e6 / 1024) * math.cos(4 * phi) -
      6 * (35 * e6 / 3072) * math.cos(6 * phi)
  }
  /** Footpoint latitude from meridian arc (rectifying series, Snyder 3-26). */
  private def phiFromM(el: Ellipsoid, m: Double): Double = {
    val e2 = el.e2
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val mu = m / (el.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e12 = e1 * e1; val e13 = e12 * e1; val e14 = e13 * e1
    mu + (3 * e1 / 2 - 27 * e13 / 32) * math.sin(2 * mu) +
      (21 * e12 / 16 - 55 * e14 / 32) * math.sin(4 * mu) +
      (151 * e13 / 96) * math.sin(6 * mu) +
      (1097 * e14 / 512) * math.sin(8 * mu)
  }

  /** Cassini-Soldner (EPSG method 9806 / Snyder ch. 13 ellipsoidal series) —
   *  the classic cadastral grid projection (Trinidad 1903, Palestine Grid,
   *  Malayan state grids). Equidistant along the central meridian and along
   *  great circles perpendicular to it; series valid within the few-degree
   *  band every published Cassini grid occupies. Validated against EPSG
   *  GN7-2's Trinidad worked example in ProjRegistrySpec. */
  final class CassiniSoldner(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                             fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val e2 = el.e2
    private val m0 = meridianArc(el, phi0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val aTerm = (math.toRadians(lonDeg) - lam0) * math.cos(phi)
      val t = math.tan(phi) * math.tan(phi)
      val c = e2 * math.cos(phi) * math.cos(phi) / (1 - e2)
      val nu = el.a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val a2 = aTerm * aTerm; val a3 = a2 * aTerm; val a4 = a3 * aTerm; val a5 = a4 * aTerm
      val x = nu * (aTerm - t * a3 / 6 - (8 - t + 8 * c) * t * a5 / 120)
      val yArc = meridianArc(el, phi) - m0 +
        nu * math.tan(phi) * (a2 / 2 + (5 - t + 6 * c) * a4 / 24)
      (fe + x, fn + yArc)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi1 = phiFromM(el, m0 + (y - fn))
      if (math.abs(math.abs(phi1) - math.Pi / 2) < 1e-12)
        return (math.toDegrees(lam0), math.toDegrees(phi1))
      val t1 = math.tan(phi1) * math.tan(phi1)
      val sin1 = math.sin(phi1)
      val nu1 = el.a / math.sqrt(1 - e2 * sin1 * sin1)
      val rho1 = el.a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val d = (x - fe) / nu1
      val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d
      val phi = phi1 - (nu1 * math.tan(phi1) / rho1) * (d2 / 2 - (1 + 3 * t1) * d4 / 24)
      val lam = lam0 + (d - t1 * d3 / 3 + (1 + 3 * t1) * t1 * d5 / 15) / math.cos(phi1)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** American Polyconic (EPSG method 9818 / Snyder ch. 18 ellipsoidal) —
   *  the historical USGS and Brazilian national-map projection (SAD69 /
   *  SIRGAS Brazil Polyconic). Each parallel is a circular arc at its own
   *  cone constant. Forward matches Snyder's published numerical example;
   *  inverse is Snyder's 18-18..18-21 iteration. */
  final class Polyconic(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                        fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val e2 = el.e2
    private val m0 = meridianArc(el, phi0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val dLam = math.toRadians(lonDeg) - lam0
      if (math.abs(phi) < 1e-12) (fe + el.a * dLam, fn - m0)
      else {
        val nu = el.a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
        val cot = 1.0 / math.tan(phi)
        val l = dLam * math.sin(phi)
        (fe + nu * cot * math.sin(l),
         fn + meridianArc(el, phi) - m0 + nu * cot * (1 - math.cos(l)))
      }
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = y - fn
      val aTerm = (m0 + dy) / el.a
      if (math.abs(aTerm) < 1e-12 && math.abs(dy + m0) < 1e-6)
        return (math.toDegrees(lam0 + dx / el.a), 0.0)
      val b = dx * dx / (el.a * el.a) + aTerm * aTerm
      var phi = aTerm
      var i = 0
      while (i < 25) {
        val c = math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi)) * math.tan(phi)
        val ma = meridianArc(el, phi) / el.a
        val mp = meridianArcPrime(el, phi)
        val num = aTerm * (c * ma + 1) - ma - c * (ma * ma + b) / 2
        val den = e2 * math.sin(2 * phi) * (ma * ma + b - 2 * aTerm * ma) / (4 * c) +
          (aTerm - ma) * (c * mp - 2 / math.sin(2 * phi)) - mp
        val next = phi - num / den
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 25 } else { phi = next; i += 1 }
      }
      val c = math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi)) * math.tan(phi)
      val lam = lam0 + math.asin(math.max(-1, math.min(1, dx * c / el.a))) / math.sin(phi)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Equidistant Cylindrical (EPSG method 1028; Plate Carrée when the
   *  standard parallel is the equator) — e.g. EPSG:4087 WGS 84 / World
   *  Equidistant Cylindrical. True-to-scale meridians (meridian arc as
   *  northing). GN7-2 worked example pinned in ProjRegistrySpec. */
  final class EquidistantCyl(el: Ellipsoid, lat1Deg: Double, lon0Deg: Double,
                             fe: Double, fn: Double) extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val nu1CosPhi1 =
      el.a * math.cos(phi1) / math.sqrt(1 - el.e2 * math.sin(phi1) * math.sin(phi1))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      (fe + nu1CosPhi1 * (math.toRadians(lonDeg) - lam0),
       fn + meridianArc(el, math.toRadians(latDeg)))
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(lam0 + (x - fe) / nu1CosPhi1),
       math.toDegrees(phiFromM(el, y - fn)))
  }

  /** Guam projection (EPSG method 9831) — the simplified azimuthal
   *  equidistant used by the Guam 1963 survey grid (EPSG:3993). Forward is
   *  closed-form; inverse iterates the meridian-arc relation (3 passes per
   *  GN7-2; 5 here for slack). GN7-2 worked example pinned in
   *  ProjRegistrySpec. */
  final class GuamAzEq(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                       fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val e2 = el.e2
    private val m0 = meridianArc(el, phi0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val w = math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val x = el.a * (math.toRadians(lonDeg) - lam0) * math.cos(phi) / w
      (fe + x, fn + meridianArc(el, phi) - m0 + x * x * math.tan(phi) * w / (2 * el.a))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = y - fn
      var phi = phi0
      var i = 0
      while (i < 5) {
        val w = math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
        phi = phiFromM(el, m0 + dy - dx * dx * math.tan(phi) * w / (2 * el.a))
        i += 1
      }
      val w = math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      (math.toDegrees(lam0 + dx * w / (el.a * math.cos(phi))), math.toDegrees(phi))
    }
  }

  /** Hotine Oblique Mercator (EPSG methods 9812 variant A / 9815 variant B;
   *  Snyder 9-1..9-47, EPSG Guidance Note 7-2 formulation). The projection
   *  for grids whose area of use runs diagonally (Malaysian RSO, Alaska
   *  zone 1, Swiss-style oblique belts). `variantA` (PROJ `+no_uoff`): grid
   *  coordinates originate at the natural origin; variant B subtracts the
   *  centre offset uc and anchors FE/FN at the projection centre. */
  final class Omerc(el: Ellipsoid, latCDeg: Double, lonCDeg: Double,
                    alphaCDeg: Double, gammaCDeg: Double, kC: Double,
                    fe: Double, fn: Double, variantA: Boolean) extends Projection {
    private val phiC = math.toRadians(latCDeg)
    private val lamC = math.toRadians(lonCDeg)
    private val alphaC = math.toRadians(alphaCDeg)
    private val gammaC = math.toRadians(gammaCDeg)
    private val e = el.e; private val e2 = el.e2
    private val cosPhiC = math.cos(phiC); private val sinPhiC = math.sin(phiC)
    private val bB = math.sqrt(1 + e2 * math.pow(cosPhiC, 4) / (1 - e2))
    private val aA = el.a * bB * kC * math.sqrt(1 - e2) / (1 - e2 * sinPhiC * sinPhiC)
    private val t0 = tFn(el, phiC)
    private val dD = math.max(1.0,
      bB * math.sqrt(1 - e2) / (cosPhiC * math.sqrt(1 - e2 * sinPhiC * sinPhiC)))
    private val sgn = if (phiC >= 0) 1.0 else -1.0
    private val fF = dD + math.sqrt(dD * dD - 1) * sgn
    private val hH = fF * math.pow(t0, bB)
    private val gG = (fF - 1 / fF) / 2
    private val gamma0 = math.asin(math.sin(alphaC) / dD)
    private val lam0 = lamC - math.asin(gG * math.tan(gamma0)) / bB
    private val cosGamma0 = math.cos(gamma0); private val sinGamma0 = math.sin(gamma0)
    private val uC =
      if (variantA) 0.0
      else {
        // variant B's centre offset is BY DEFINITION u_A evaluated at the
        // projection centre (so the centre maps onto the false origin).
        // Evaluating the same atan2 form used per-point keeps the two
        // internally consistent for every αc INCLUDING the αc=90 EOV case,
        // where the closed form (A/B)·atan(√(D²−1)/cos αc) degenerates.
        // For αc≠90 this equals the closed form to machine precision.
        val tC = tFn(el, phiC)
        val qC = fF / math.pow(tC / t0, bB) // = F at the centre
        val sC = (qC - 1 / qC) / 2
        val vC = math.sin(bB * (lamC - lam0))
        aA * math.atan2(sC * math.cos(gamma0) + vC * math.sin(gamma0),
          math.cos(bB * (lamC - lam0))) / bB
      }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = math.toRadians(lonDeg)
      val t = tFn(el, math.toRadians(latDeg))
      val q = hH / math.pow(t, bB)
      val s = (q - 1 / q) / 2
      val tt = (q + 1 / q) / 2
      val bigV = math.sin(bB * (lam - lam0))
      val bigU = (-bigV * cosGamma0 + s * sinGamma0) / tt
      val v = aA * math.log((1 - bigU) / (1 + bigU)) / (2 * bB)
      val u = aA * math.atan2(s * cosGamma0 + bigV * sinGamma0,
        math.cos(bB * (lam - lam0))) / bB - uC
      (fe + v * math.cos(gammaC) + u * math.sin(gammaC),
       fn + u * math.cos(gammaC) - v * math.sin(gammaC))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val vP = (x - fe) * math.cos(gammaC) - (y - fn) * math.sin(gammaC)
      val uP = (y - fn) * math.cos(gammaC) + (x - fe) * math.sin(gammaC) + uC
      val qP = math.exp(-bB * vP / aA)
      val sP = (qP - 1 / qP) / 2
      val tP = (qP + 1 / qP) / 2
      val bigVP = math.sin(bB * uP / aA)
      val bigUP = (bigVP * cosGamma0 + sP * sinGamma0) / tP
      val t = math.pow(hH / math.sqrt((1 + bigUP) / (1 - bigUP)), 1 / bB)
      val phi = phiFromT(el, t)
      val lam = lam0 - math.atan2(sP * cosGamma0 - bigVP * sinGamma0,
        math.cos(bB * uP / aA)) / bB
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Swiss Oblique Mercator (EPSG method 9814 — CH1903/LV03 and
   *  CH1903+/LV95; PROJ `+proj=somerc`): the official double projection —
   *  ellipsoid → conformal sphere at the projection centre, then rotation
   *  of the centre onto the pseudo-equator and a spherical Mercator.
   *  Formulas from the published swisstopo projection document (also
   *  Snyder's oblique conformal sphere development). */
  final class Somerc(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                     k0: Double, fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val e = el.e; private val e2 = el.e2
    private val sinPhi0 = math.sin(phi0); private val cosPhi0 = math.cos(phi0)
    private val rR = k0 * el.a * math.sqrt(1 - e2) / (1 - e2 * sinPhi0 * sinPhi0)
    private val alpha = math.sqrt(1 + e2 / (1 - e2) * math.pow(cosPhi0, 4))
    private val b0 = math.asin(sinPhi0 / alpha)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
      alpha * e / 2 * math.log((1 + e * sinPhi0) / (1 - e * sinPhi0))
    private val sinB0 = math.sin(b0); private val cosB0 = math.cos(b0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val esin = e * math.sin(phi)
      val sS = alpha * math.log(math.tan(math.Pi / 4 + phi / 2)) -
        alpha * e / 2 * math.log((1 + esin) / (1 - esin)) + bigK
      val b = 2 * (math.atan(math.exp(sS)) - math.Pi / 4)
      val l = alpha * (math.toRadians(lonDeg) - lam0)
      val sinB = math.sin(b); val cosB = math.cos(b)
      val bBar = math.asin(cosB0 * sinB - sinB0 * cosB * math.cos(l))
      val lBar = math.atan2(cosB * math.sin(l),
        sinB0 * sinB + cosB0 * cosB * math.cos(l))
      (fe + rR * lBar,
       fn + rR / 2 * math.log((1 + math.sin(bBar)) / (1 - math.sin(bBar))))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lBar = (x - fe) / rR
      val bBar = 2 * (math.atan(math.exp((y - fn) / rR)) - math.Pi / 4)
      val sinBBar = math.sin(bBar); val cosBBar = math.cos(bBar)
      val b = math.asin(cosB0 * sinBBar + sinB0 * cosBBar * math.cos(lBar))
      val l = math.atan2(cosBBar * math.sin(lBar),
        cosB0 * math.cos(lBar) * cosBBar - sinB0 * sinBBar)
      // latitude back through the conformal-sphere relation by iteration
      val sS = math.log(math.tan(math.Pi / 4 + b / 2))
      var phi = b
      var i = 0
      while (i < 20) {
        val esin = e * math.sin(phi)
        val next = 2 * (math.atan(math.exp(
          (sS - bigK) / alpha + e / 2 * math.log((1 + esin) / (1 - esin)))) - math.Pi / 4)
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 20 } else { phi = next; i += 1 }
      }
      (math.toDegrees(lam0 + l / alpha), math.toDegrees(phi))
    }
  }

  /** Krovak (EPSG method 9819 — S-JTSK, Czechia/Slovakia): conformal sphere,
   *  rotation to an oblique pole, then a conformal cone on the pseudo
   *  standard parallel. Axes are SOUTH/WEST-oriented in EPSG:5514 (handled
   *  by [[SouthOriented]]); this kernel emits the positive (southing,
   *  westing) pair as (x=westing Y, y=southing X) negated for ENU use.
   *  Formulas per EPSG Guidance Note 7-2. */
  final class Krovak(el: Ellipsoid, latCDeg: Double, lonOriginDeg: Double,
                     alphaCDeg: Double, latPDeg: Double, kP: Double,
                     fe: Double, fn: Double) extends Projection {
    private val phiC = math.toRadians(latCDeg)     // 49°30'
    private val lam0 = math.toRadians(lonOriginDeg)
    private val alphaC = math.toRadians(alphaCDeg) // 30°17'17.3031"
    private val phiP = math.toRadians(latPDeg)     // 78°30'
    private val e = el.e; private val e2 = el.e2
    private val sinPhiC = math.sin(phiC); private val cosPhiC = math.cos(phiC)
    private val bigA = el.a * math.sqrt(1 - e2) / (1 - e2 * sinPhiC * sinPhiC)
    private val bigB = math.sqrt(1 + e2 * math.pow(cosPhiC, 4) / (1 - e2))
    private val gamma0 = math.asin(sinPhiC / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * sinPhiC) / (1 - e * sinPhiC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = kP * bigA / math.tan(phiP)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val esin = e * math.sin(phi)
      val u = 2 * (math.atan(t0 * math.pow(math.tan(math.Pi / 4 + phi / 2), bigB) /
        math.pow((1 + esin) / (1 - esin), e * bigB / 2)) - math.Pi / 4)
      val v = bigB * (lam0 - math.toRadians(lonDeg))
      val t = math.asin(math.cos(alphaC) * math.sin(u) +
        math.sin(alphaC) * math.cos(u) * math.cos(v))
      val d = math.asin(math.cos(u) * math.sin(v) / math.cos(t))
      val theta = n * d
      val r = r0 * math.pow(math.tan(math.Pi / 4 + phiP / 2), n) /
        math.pow(math.tan(t / 2 + math.Pi / 4), n)
      // EPSG emits Southing X = r cosθ + FN, Westing Y = r sinθ + FE; the
      // ENU-facing pair negates both (east = −westing, north = −southing)
      (-(r * math.sin(theta) + fe), -(r * math.cos(theta) + fn))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val yW = -x - fe   // westing
      val xS = -y - fn   // southing
      val r = math.sqrt(xS * xS + yW * yW)
      val theta = math.atan2(yW, xS)
      val d = theta / math.sin(phiP)
      val t = 2 * (math.atan(math.pow(r0 / r, 1 / n) *
        math.tan(math.Pi / 4 + phiP / 2)) - math.Pi / 4)
      val u = math.asin(math.cos(alphaC) * math.sin(t) -
        math.sin(alphaC) * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      // latitude by iteration on the conformal relation
      var phi = u
      var i = 0
      while (i < 20) {
        val esin = e * math.sin(phi)
        val next = 2 * (math.atan(
          math.pow(t0, -1 / bigB) *
            math.pow(math.tan(u / 2 + math.Pi / 4), 1 / bigB) *
            math.pow((1 + esin) / (1 - esin), e / 2)) - math.Pi / 4)
        if (math.abs(next - phi) < 1e-14) { phi = next; i = 20 } else { phi = next; i += 1 }
      }
      (math.toDegrees(lam0 - v / bigB), math.toDegrees(phi))
    }
  }

  /** Oblique Stereographic (EPSG method 9809 — the Dutch RD New grid;
   *  PROJ `+proj=sterea`): the ellipsoid maps to a Gauss conformal sphere
   *  first, then a spherical oblique stereographic projection — NOT the
   *  same map as `+proj=stere`'s direct ellipsoidal development. Formulas
   *  per EPSG Guidance Note 7-2. */
  final class Sterea(el: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                     k0: Double, fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val e = el.e; private val e2 = el.e2
    private val sinPhi0 = math.sin(phi0)
    private val rR = el.a * math.sqrt(1 - e2) / (1 - e2 * sinPhi0 * sinPhi0)
    private val n = math.sqrt(1 + e2 * math.pow(math.cos(phi0), 4) / (1 - e2))
    private val s1 = (1 + sinPhi0) / (1 - sinPhi0)
    private val s2 = (1 - e * sinPhi0) / (1 + e * sinPhi0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val c = (n + sinPhi0) * (1 - sinChi00) / ((n - sinPhi0) * (1 + sinChi00))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val sinChi0 = math.sin(chi0); private val cosChi0 = math.cos(chi0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lamD = n * (math.toRadians(lonDeg) - lam0)
      val sa = (1 + math.sin(phi)) / (1 - math.sin(phi))
      val sb = (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val b = 1 + math.sin(chi) * sinChi0 + math.cos(chi) * cosChi0 * math.cos(lamD)
      (fe + 2 * rR * k0 * math.cos(chi) * math.sin(lamD) / b,
       fn + 2 * rR * k0 * (math.sin(chi) * cosChi0 - math.cos(chi) * sinChi0 * math.cos(lamD)) / b)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dE = x - fe; val dN = y - fn
      val g = 2 * rR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * rR * k0 * math.tan(chi0) + g
      val i = math.atan2(dE, h + dN)
      val j = math.atan2(dE, g - dN) - i
      val chi = chi0 + 2 * math.atan((dN - dE * math.tan(j / 2)) / (2 * rR * k0))
      val lamD = j + 2 * i
      val lam = lam0 + lamD / n
      // isometric-latitude iteration back to the ellipsoid (GN7-2)
      val psi = 0.5 * math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var it = 0
      while (it < 20) {
        val esin = e * math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
          math.pow((1 - esin) / (1 + esin), e / 2))
        val next = phi - (psiI - psi) * math.cos(phi) * (1 - esin * esin) / (1 - e2)
        if (math.abs(next - phi) < 1e-14) { phi = next; it = 20 } else { phi = next; it += 1 }
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** South-oriented grid wrapper (EPSG method 9808, Transverse Mercator
   *  South Orientated — the South African Hartebeesthoek94 Lo zones): axes
   *  run westing/southing, so both projected ordinates negate. */
  final class SouthOriented(inner: Projection) extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (x, y) = inner.forward(lonDeg, latDeg)
      (-x, -y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = inner.inverse(-x, -y)
  }

  // ------------------------------------------- world / small-scale kernels
  // The pseudocylindrical and azimuthal world projections are defined on the
  // sphere (Snyder chs. 20, 22, 30-32; PROJ marks them "Sph"); following
  // PROJ/ESRI practice for the World_* CRSes, an ellipsoidal datum supplies
  // the sphere radius through its semimajor axis.

  /** Mollweide (Snyder ch. 31; PROJ `moll`; ESRI:54009 World_Mollweide).
   *  Equal-area pseudocylindrical: 2θ + sin 2θ = π sin φ by Newton, then
   *  x = (2√2/π) R Δλ cos θ, y = √2 R sin θ. */
  final class Mollweide(r: Double, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val cx = 2 * math.sqrt(2) / math.Pi * r
    private val cy = math.sqrt(2) * r
    private def theta(phi: Double): Double = {
      if (math.abs(phi) >= math.Pi / 2 - 1e-12) return math.signum(phi) * math.Pi / 2
      val target = math.Pi * math.sin(phi)
      var th = phi
      var i = 0
      while (i < 60) {
        val d = 2 + 2 * math.cos(2 * th)
        if (math.abs(d) < 1e-14) i = 60
        else {
          val next = th - (2 * th + math.sin(2 * th) - target) / d
          if (math.abs(next - th) < 1e-14) { th = next; i = 60 } else { th = next; i += 1 }
        }
      }
      th
    }
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val th = theta(math.toRadians(latDeg))
      (fe + cx * (math.toRadians(lonDeg) - lam0) * math.cos(th), fn + cy * math.sin(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val s = math.max(-1.0, math.min(1.0, (y - fn) / cy))
      val th = math.asin(s)
      val phi = math.asin(math.max(-1.0, math.min(1.0, (2 * th + math.sin(2 * th)) / math.Pi)))
      val cosTh = math.cos(th)
      val lam = if (cosTh < 1e-12) lam0 else lam0 + (x - fe) / (cx * cosTh)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Sinusoidal (Snyder 30-8/30-9; PROJ `sinu`; ESRI:54008, MODIS grid via
   *  `+R=6371007.181`). Ellipsoidal: x = a Δλ cos φ / W, y = M(φ); the
   *  spherical case falls out at e = 0. Equal-area, pseudocylindrical. */
  final class Sinusoidal(el: Ellipsoid, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val w = math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))
      (fe + el.a * (math.toRadians(lonDeg) - lam0) * math.cos(phi) / w,
        fn + meridianArc(el, phi))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = phiFromM(el, y - fn)
      val cosPhi = math.cos(phi)
      val lam =
        if (math.abs(cosPhi) < 1e-12) lam0
        else {
          val w = math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))
          lam0 + (x - fe) * w / (el.a * cosPhi)
        }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Miller cylindrical (Snyder ch. 11; PROJ `mill`): x = R Δλ,
   *  y = R ln tan(π/4 + 0.4 φ) / 0.8. Neither equal-area nor conformal;
   *  the classic compromise world wall map. */
  final class MillerCyl(r: Double, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      (fe + r * (math.toRadians(lonDeg) - lam0),
        fn + r * math.log(math.tan(math.Pi / 4 + 0.4 * phi)) / 0.8)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = 2.5 * (math.atan(math.exp(0.8 * (y - fn) / r)) - math.Pi / 4)
      (math.toDegrees(lam0 + (x - fe) / r), math.toDegrees(phi))
    }
  }

  /** Eckert IV (Snyder ch. 32; PROJ `eck4`; ESRI:54012 World_Eckert_IV).
   *  Equal-area pseudocylindrical with elliptical meridians:
   *  θ + sin θ cos θ + 2 sin θ = (2 + π/2) sin φ by Newton. */
  final class EckertIv(r: Double, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private val cp = 2 + math.Pi / 2
    private val cx = 2 / math.sqrt(math.Pi * (4 + math.Pi)) * r
    private val cy = 2 * math.sqrt(math.Pi / (4 + math.Pi)) * r
    private def theta(phi: Double): Double = {
      // Newton's derivative 2 cos θ (1 + cos θ) vanishes at the poles, where
      // convergence degrades to halving — take the exact branch there
      if (math.abs(phi) >= math.Pi / 2 - 1e-12) return math.signum(phi) * math.Pi / 2
      val target = cp * math.sin(phi)
      var th = phi / 2
      var i = 0
      while (i < 60) {
        val d = 2 * math.cos(th) * (1 + math.cos(th))
        if (math.abs(d) < 1e-14) i = 60
        else {
          val next = th - (th + math.sin(th) * math.cos(th) + 2 * math.sin(th) - target) / d
          if (math.abs(next - th) < 1e-14) { th = next; i = 60 } else { th = next; i += 1 }
        }
      }
      th
    }
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val th = theta(math.toRadians(latDeg))
      (fe + cx * (math.toRadians(lonDeg) - lam0) * (1 + math.cos(th)), fn + cy * math.sin(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val th = math.asin(math.max(-1.0, math.min(1.0, (y - fn) / cy)))
      val phi = math.asin(math.max(-1.0, math.min(1.0,
        (th + math.sin(th) * math.cos(th) + 2 * math.sin(th)) / cp)))
      val lam = lam0 + (x - fe) / (cx * (1 + math.cos(th)))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Equal Earth (Šavrič, Patterson & Jenny 2018; EPSG method 1078; PROJ
   *  `eqearth`; EPSG:8857-8859). Equal-area pseudocylindrical defined by a
   *  published degree-9 polynomial in the parametric latitude θ, where
   *  sin θ = (√3/2) sin β and β is the authalic latitude (so the ellipsoidal
   *  form is exact, like LAEA/CEA):
   *    x = Rq · (2√3/3) Δλ cos θ / P'(θ),   y = Rq · P(θ)
   *    P(θ)  = A1 θ + A2 θ³ + A3 θ⁷ + A4 θ⁹
   *    P'(θ) = A1 + 3 A2 θ² + 7 A3 θ⁶ + 9 A4 θ⁸
   *  with the published coefficients below and Rq = a √(qp/2) the authalic
   *  radius. Inverse: Newton on θ from y, then β from sin θ, then Snyder
   *  3-16 for φ. */
  final class EqualEarth(el: Ellipsoid, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    import EqualEarth._
    private val lam0 = math.toRadians(lon0Deg)
    private val qp = qFn(el, math.Pi / 2)
    private val rq = el.a * math.sqrt(qp / 2)
    private def pTheta(th: Double): Double = {
      val t2 = th * th; val t6 = t2 * t2 * t2
      th * (A1 + A2 * t2 + t6 * (A3 + A4 * t2))
    }
    private def pThetaD(th: Double): Double = {
      val t2 = th * th; val t6 = t2 * t2 * t2
      A1 + 3 * A2 * t2 + t6 * (7 * A3 + 9 * A4 * t2)
    }
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinBeta =
        if (el.e2 == 0) math.sin(phi)
        else math.max(-1.0, math.min(1.0, qFn(el, phi) / qp))
      val th = math.asin(math.max(-1.0, math.min(1.0, M * sinBeta)))
      // Δλ wraps to [-π, π) so non-Greenwich aspects (8858/8859) stay on
      // the single world sheet, like PROJ's adjlon
      val dRaw = math.toRadians(lonDeg) - lam0
      val dl = dRaw - 2 * math.Pi * math.floor((dRaw + math.Pi) / (2 * math.Pi))
      (fe + rq * (2 * math.sqrt(3) / 3) * dl * math.cos(th) / pThetaD(th),
        fn + rq * pTheta(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val target = (y - fn) / rq
      // Newton from the linear term; P' >= ~0.88 over θ ∈ [-π/3, π/3], so
      // the iteration is uniformly well-conditioned
      var th = target / A1
      var i = 0
      while (i < 30) {
        val next = th - (pTheta(th) - target) / pThetaD(th)
        if (math.abs(next - th) < 1e-14) { th = next; i = 30 } else { th = next; i += 1 }
      }
      val sinBeta = math.max(-1.0, math.min(1.0, math.sin(th) / M))
      val phi =
        if (el.e2 == 0) math.asin(sinBeta)
        else phiFromQ(el, qp * sinBeta)
      val cosTh = math.cos(th)
      val lam =
        if (cosTh < 1e-12) lam0
        else lam0 + (x - fe) * pThetaD(th) / (rq * (2 * math.sqrt(3) / 3) * cosTh)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }
  object EqualEarth {
    // published polynomial coefficients (Šavrič et al. 2018, eq. 1-3)
    val A1 = 1.340264; val A2 = -0.081106; val A3 = 0.000893; val A4 = 0.003796
    val M = math.sqrt(3) / 2
  }

  /** New Zealand Map Grid (EPSG method 9811; Reilly 1973, the LINZ
   *  LINZG25700 standard) — the sixth-order complex-polynomial conformal
   *  projection behind EPSG:27200, fixed to the International 1924
   *  ellipsoid and the (-41°, 173°E) origin. Forward: a real series turns
   *  Δφ into an isometric-latitude-like Δψ, then one complex polynomial
   *  ζ = ΣB_k z^k maps z = Δψ + iΔλ conformally to grid space. Inverse:
   *  the published C-series gives a first approximation, refined by two
   *  Newton steps on the B polynomial (PROJ `nzmg` does the same).
   *  Coefficients are the published LINZ/Reilly values. */
  final class Nzmg(fe: Double, fn: Double) extends Projection {
    import Nzmg._
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // Δφ in units of 1e5 arc-seconds (the series' published scaling)
      val th = (latDeg - Lat0) * 3600e-5
      var psi = 0.0
      var p = 1.0
      var i = 0
      while (i < A.length) { p *= th; psi += A(i) * p; i += 1 }
      val dLam = math.toRadians(lonDeg - Lon0)
      // ζ = Σ B_k z^k, z = Δψ + iΔλ (Horner on the complex polynomial)
      var zr = 0.0; var zi = 0.0
      var k = B.length - 1
      while (k >= 0) {
        val nr = zr * psi - zi * dLam + B(k)._1
        val ni = zr * dLam + zi * psi + B(k)._2
        zr = nr; zi = ni
        k -= 1
      }
      // multiply the Horner accumulation by z once more (series starts at k=1)
      val er = zr * psi - zi * dLam
      val ei = zr * dLam + zi * psi
      (fe + A0 * ei, fn + A0 * er)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val wr = (y - fn) / A0; val wi = (x - fe) / A0
      // first approximation from the published inverse series C
      var zr = 0.0; var zi = 0.0
      var k = C.length - 1
      while (k >= 0) {
        val nr = zr * wr - zi * wi + C(k)._1
        val ni = zr * wi + zi * wr + C(k)._2
        zr = nr; zi = ni
        k -= 1
      }
      var pr = zr * wr - zi * wi
      var pi = zr * wi + zi * wr
      // two Newton refinements: solve ΣB_k z^k = w for z
      var it = 0
      while (it < 2) {
        // num = w + Σ_{k>=2} (k-1) B_k z^k ; den = Σ k B_k z^{k-1}
        var nr = 0.0; var ni = 0.0; var dr = 0.0; var di = 0.0
        var tr = 1.0; var ti = 0.0 // z^{k-1}
        var j = 0
        while (j < B.length) {
          val kk = j + 1
          dr += kk * (B(j)._1 * tr - B(j)._2 * ti)
          di += kk * (B(j)._1 * ti + B(j)._2 * tr)
          val ur = tr * pr - ti * pi // z^k
          val ui = tr * pi + ti * pr
          if (kk >= 2) {
            nr += (kk - 1) * (B(j)._1 * ur - B(j)._2 * ui)
            ni += (kk - 1) * (B(j)._1 * ui + B(j)._2 * ur)
          }
          tr = ur; ti = ui
          j += 1
        }
        nr += wr; ni += wi
        val dd = dr * dr + di * di
        pr = (nr * dr + ni * di) / dd
        pi = (ni * dr - nr * di) / dd
        it += 1
      }
      val psi = pr; val dLam = pi
      // latitude from Δψ via the published D series + one Newton step on A
      var th = 0.0
      var q = 1.0
      var j = 0
      while (j < D.length) { q *= psi; th += D(j) * q; j += 1 }
      // Newton: find th with ΣA_i th^i = psi
      var fv = 0.0; var fd = 0.0
      var t = 1.0
      j = 0
      while (j < A.length) {
        fd += (j + 1) * A(j) * t
        t *= th
        fv += A(j) * t
        j += 1
      }
      th -= (fv - psi) / fd
      (Lon0 + math.toDegrees(dLam), Lat0 + th * 1e5 / 3600)
    }
  }
  object Nzmg {
    val Lat0 = -41.0; val Lon0 = 173.0
    val A0 = 6378388.0 // International 1924 semi-major (the method fixes it)
    // Δφ→Δψ series (LINZ LINZG25700 table; Reilly 1973)
    val A = Array(0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
      0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    // complex forward polynomial B_1..B_6
    val B = Array(
      (0.7557853228, 0.0), (0.249204646, 0.003371507), (-0.001541739, 0.041058560),
      (-0.10162907, 0.01727609), (-0.26623489, -0.36249218), (-0.6870983, -1.1651967))
    // complex inverse first-approximation polynomial C_1..C_6
    val C = Array(
      (1.3231270439, 0.0), (-0.577245789, -0.007809598), (0.508307513, -0.112208952),
      (-0.15094762, 0.18200602), (1.01418179, 1.64497696), (1.9660549, 2.5127645))
    // Δψ→Δφ inverse series D_1..D_9
    val D = Array(1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
      -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
  }

  /** Orthographic, oblique spherical aspect (Snyder 20-3..20-6; PROJ
   *  `ortho`): the view from infinity. Only the near hemisphere projects;
   *  points with cos c < 0 are rejected loudly (PROJ errors the same way). */
  final class Orthographic(r: Double, lat0Deg: Double, lon0Deg: Double,
                           fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sinP0 = math.sin(phi0); private val cosP0 = math.cos(phi0)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg); val dLam = math.toRadians(lonDeg) - lam0
      val cosC = sinP0 * math.sin(phi) + cosP0 * math.cos(phi) * math.cos(dLam)
      if (cosC < -1e-10) throw new IllegalArgumentException(
        s"ST_Transform: ($lonDeg,$latDeg) is on the far hemisphere of this orthographic projection")
      (fe + r * math.cos(phi) * math.sin(dLam),
        fn + r * (cosP0 * math.sin(phi) - sinP0 * math.cos(phi) * math.cos(dLam)))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) / r; val dy = (y - fn) / r
      val rho = math.sqrt(dx * dx + dy * dy)
      if (rho < 1e-12) return (math.toDegrees(lam0), math.toDegrees(phi0))
      if (rho > 1 + 1e-9) throw new IllegalArgumentException(
        s"ST_Transform: ($x,$y) lies outside the orthographic horizon circle")
      val c = math.asin(math.min(1.0, rho))
      val sinC = math.sin(c); val cosC = math.cos(c)
      val phi = math.asin(cosC * sinP0 + dy * sinC * cosP0 / rho)
      val lam = lam0 + math.atan2(dx * sinC, rho * cosP0 * cosC - dy * sinP0 * sinC)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Gnomonic, oblique spherical aspect (Snyder 22-4/22-5; PROJ `gnom`):
   *  great circles map to straight lines. Defined strictly inside one
   *  hemisphere (cos c > 0). */
  final class Gnomonic(r: Double, lat0Deg: Double, lon0Deg: Double,
                       fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sinP0 = math.sin(phi0); private val cosP0 = math.cos(phi0)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg); val dLam = math.toRadians(lonDeg) - lam0
      val cosC = sinP0 * math.sin(phi) + cosP0 * math.cos(phi) * math.cos(dLam)
      if (cosC < 1e-10) throw new IllegalArgumentException(
        s"ST_Transform: ($lonDeg,$latDeg) is 90 degrees or more from this gnomonic projection centre")
      (fe + r * math.cos(phi) * math.sin(dLam) / cosC,
        fn + r * (cosP0 * math.sin(phi) - sinP0 * math.cos(phi) * math.cos(dLam)) / cosC)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) / r; val dy = (y - fn) / r
      val rho = math.sqrt(dx * dx + dy * dy)
      if (rho < 1e-12) return (math.toDegrees(lam0), math.toDegrees(phi0))
      val c = math.atan(rho)
      val sinC = math.sin(c); val cosC = math.cos(c)
      val phi = math.asin(cosC * sinP0 + dy * sinC * cosP0 / rho)
      val lam = lam0 + math.atan2(dx * sinC, rho * cosP0 * cosC - dy * sinP0 * sinC)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Robinson (Robinson 1974; Snyder ch. 33 Table 32; PROJ `robin`;
   *  ESRI:54030 World_Robinson). Defined by the published 5°-interval table
   *  of length (X) and parallel-distance (Y) multipliers:
   *  x = 0.8487 R X(φ) Δλ, y = 1.3523 R Y(φ) sgn(φ). Between nodes both
   *  series interpolate with a natural cubic spline (smooth like PROJ's
   *  precomputed Chebyshev-fitted coefficients; identical at the nodes,
   *  which carry the projection's definition). */
  final class Robinson(r: Double, lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    import Robinson._
    private val lam0 = math.toRadians(lon0Deg)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val aLat = math.abs(latDeg)
      (fe + 0.8487 * r * splineAt(xs2, aLat) * (math.toRadians(lonDeg) - lam0),
        fn + 1.3523 * r * splineAt(ys2, aLat) * math.signum(latDeg))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val yy = math.min(1.0, math.abs(y - fn) / (1.3523 * r))
      // Y is strictly increasing in |φ|: bisect the spline
      var lo = 0.0; var hi = 90.0
      var i = 0
      while (i < 60) {
        val mid = (lo + hi) / 2
        if (splineAt(ys2, mid) < yy) lo = mid else hi = mid
        i += 1
      }
      val aLat = (lo + hi) / 2
      val lat = aLat * math.signum(y - fn)
      val lam = lam0 + (x - fe) / (0.8487 * r * splineAt(xs2, aLat))
      (math.toDegrees(lam), lat)
    }
  }

  object Robinson {
    // Robinson's published table, latitude 0..90 in 5° steps
    // (Snyder Table 32: X = length multiplier, Y = distance multiplier).
    private[geom] val tabX = Array(
      1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427, 0.9216,
      0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732, 0.6213, 0.5722, 0.5322)
    private[geom] val tabY = Array(
      0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340, 0.4958,
      0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936, 0.9394, 0.9761, 1.0000)
    /** Natural cubic spline second derivatives over the 5°-spaced nodes:
     *  Thomas solve of y2(i-1) + 4 y2(i) + y2(i+1) = 6 (v(i+1) - 2 v(i) +
     *  v(i-1)) / h², with natural ends y2(0) = y2(n-1) = 0. */
    private def secondDerivs(v: Array[Double]): Array[Double] = {
      val n = v.length
      val cPrime = new Array[Double](n); val dPrime = new Array[Double](n)
      var i = 1
      while (i < n - 1) {
        val rhs = (v(i + 1) - 2 * v(i) + v(i - 1)) * 6 / (5.0 * 5.0)
        val denom = 4 - cPrime(i - 1)
        cPrime(i) = 1 / denom
        dPrime(i) = (rhs - dPrime(i - 1)) / denom
        i += 1
      }
      val out = new Array[Double](n)
      i = n - 2
      while (i >= 1) { out(i) = dPrime(i) - cPrime(i) * out(i + 1); i -= 1 }
      out
    }
    private[geom] val xs2 = (tabX, secondDerivs(tabX))
    private[geom] val ys2 = (tabY, secondDerivs(tabY))
    /** evaluate the spline at |lat| in degrees (clamped to [0, 90]) */
    private[geom] def splineAt(t: (Array[Double], Array[Double]), aLat: Double): Double = {
      val (v, y2) = t
      val c = math.max(0.0, math.min(90.0 - 1e-12, aLat))
      val i = (c / 5.0).toInt
      val a = (5.0 * (i + 1) - c) / 5.0
      val b = 1 - a
      a * v(i) + b * v(i + 1) +
        ((a * a * a - a) * y2(i) + (b * b * b - b) * y2(i + 1)) * 25.0 / 6.0
    }
  }

  // ---------------------------------------------------------------- registry

  /** A registered CRS: projection kernel + datum + a lon/lat probe point
   *  inside the CRS's area of use (for round-trip testing) + an equivalent
   *  `+proj=` parameter string (surfaced by ST_Read_Meta; parseable back
   *  through [[fromProjString]]). */
  final case class Crs(name: String, proj: Projection, datum: Datum, probe: (Double, Double),
                       proj4: String = null,
                       /** vertical datum: geoid undulation grids (`+geoidgrids=`);
                         * heights in this CRS are orthometric, h_ell = H + N */
                       vgrid: Option[Seq[Gtx.Grid]] = None)

  private def ellpsTag(el: Ellipsoid): String =
    if (el == Wgs84) "+ellps=WGS84" else if (el == Grs80) "+ellps=GRS80"
    else if (el == Airy1830) "+ellps=airy" else if (el == AiryModified) "+ellps=mod_airy"
    else if (el == Intl1924) "+ellps=intl" else if (el == Clarke1866) "+ellps=clrk66"
    else if (el == Bessel1841) "+ellps=bessel" else if (el == Everest1967) "+ellps=evrst69"
    else if (el == Grs67Mod) "+ellps=aust_SA" else if (el == Clarke1858) "+ellps=clrk58"
    else if (el == Krass1940) "+ellps=krass" else if (el == Clarke1880Ign) "+ellps=clrk80ign"
    else if (el == Everest1937) "+ellps=evrst30" else if (el == Everest1948) "+ellps=evrst48"
    else if (el == Helmert1906) "+ellps=helmert" else if (el == Clarke1880Rgs) "+ellps=clrk80"
    else if (el.invF.isInfinite) s"+R=${fmtP(el.a)}"
    else s"+a=${el.a} +rf=${el.invF}"

  private def datumTags(d: Datum): String = d.grid match {
    case Some(g) => s"${ellpsTag(d.el)} +nadgrids=${g.source}"
    case None => d.shift match {
      case None => ellpsTag(d.el)
      case Some(h) => s"${ellpsTag(d.el)} +towgs84=${h.tx},${h.ty},${h.tz},${h.rxAs},${h.ryAs},${h.rzAs},${h.dsPpm}"
    }
  }

  private def fmtP(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  /** degrees-minutes-seconds → decimal degrees (sign carried by degrees) */
  private def dms(d: Int, m: Int, s: Double = 0.0): Double = {
    val a = math.abs(d) + m / 60.0 + s / 3600.0
    if (d < 0) -a else a
  }

  /** Named EPSG entries (parameter values from the public EPSG dataset).
   *  UTM-style zone families (NAD83/ETRS89/GDA/SIRGAS/ED50/WGS84) are handled
   *  by pattern in [[lookup]] rather than enumerated here. */
  lazy val registry: Map[String, Crs] = {
    val g = DatumGrs80; val w = DatumWgs84
    def lcc(name: String, p1: Double, p2: Double, p0: Double, l0: Double,
            fe: Double, fn: Double, d: Datum = g, probe: (Double, Double)) =
      Crs(name, new Lcc2SP(d.el, p1, p2, p0, l0, fe, fn), d, probe,
        s"+proj=lcc +lat_1=${fmtP(p1)} +lat_2=${fmtP(p2)} +lat_0=${fmtP(p0)} +lon_0=${fmtP(l0)} " +
          s"+x_0=${fmtP(fe)} +y_0=${fmtP(fn)} ${datumTags(d)} +units=m +no_defs")
    def alb(name: String, p1: Double, p2: Double, p0: Double, l0: Double,
            fe: Double, fn: Double, d: Datum = g, probe: (Double, Double)) =
      Crs(name, new Albers(d.el, p1, p2, p0, l0, fe, fn), d, probe,
        s"+proj=aea +lat_1=${fmtP(p1)} +lat_2=${fmtP(p2)} +lat_0=${fmtP(p0)} +lon_0=${fmtP(l0)} " +
          s"+x_0=${fmtP(fe)} +y_0=${fmtP(fn)} ${datumTags(d)} +units=m +no_defs")
    def laea(name: String, p0: Double, l0: Double, fe: Double, fn: Double,
             d: Datum = g, probe: (Double, Double)) =
      Crs(name, new Laea(d.el, p0, l0, fe, fn), d, probe,
        s"+proj=laea +lat_0=${fmtP(p0)} +lon_0=${fmtP(l0)} +x_0=${fmtP(fe)} +y_0=${fmtP(fn)} " +
          s"${datumTags(d)} +units=m +no_defs")
    def tm(name: String, lat0: Double, lon0: Double, k0: Double,
           fe: Double, fn: Double, d: Datum = g, probe: (Double, Double)) =
      Crs(name, new TransMerc(d.el, lat0, lon0, k0, fe, fn), d, probe,
        s"+proj=tmerc +lat_0=${fmtP(lat0)} +lon_0=${fmtP(lon0)} +k=${fmtP(k0)} " +
          s"+x_0=${fmtP(fe)} +y_0=${fmtP(fn)} ${datumTags(d)} +units=m +no_defs")
    def lcc1(name: String, p0: Double, l0: Double, k0: Double, fe: Double, fn: Double,
             d: Datum = g, probe: (Double, Double)) =
      Crs(name, new Lcc1SP(d.el, p0, l0, k0, fe, fn), d, probe,
        s"+proj=lcc +lat_1=${fmtP(p0)} +lat_0=${fmtP(p0)} +lon_0=${fmtP(l0)} +k_0=${fmtP(k0)} " +
          s"+x_0=${fmtP(fe)} +y_0=${fmtP(fn)} ${datumTags(d)} +units=m +no_defs")

    val base = Map(
      // ------------------------------------------ conformal conic (LCC 2SP)
      "EPSG:2154" -> lcc("RGF93 v1 / Lambert-93", 49, 44, 46.5, 3, 700000, 6600000, probe = (2.35, 48.85)),
      "EPSG:3034" -> lcc("ETRS89-extended / LCC Europe", 35, 65, 52, 10, 4000000, 2800000, probe = (10, 50)),
      "EPSG:3347" -> lcc("NAD83 / Statistics Canada Lambert", 49, 77, 63.390675, dms(-91, 52), 6200000, 3000000, probe = (-95, 55)),
      "EPSG:3978" -> lcc("NAD83 / Canada Atlas Lambert", 49, 77, 49, -95, 0, 0, probe = (-95, 55)),
      "EPSG:3979" -> lcc("NAD83(CSRS) / Canada Atlas Lambert", 49, 77, 49, -95, 0, 0, probe = (-95, 55)),
      "EPSG:3812" -> lcc("ETRS89 / Belgian Lambert 2008", dms(49, 50), dms(51, 10), 50.797815, dms(4, 21, 33.177), 649328, 665262, probe = (4.35, 50.85)),
      // US state plane (NAD83, meters) — LCC zones
      "EPSG:26941" -> lcc("NAD83 / California zone 1", dms(41, 40), 40, dms(39, 20), -122, 2000000, 500000, probe = (-122.5, 40.8)),
      "EPSG:26942" -> lcc("NAD83 / California zone 2", dms(39, 50), dms(38, 20), dms(37, 40), -122, 2000000, 500000, probe = (-122.3, 39)),
      "EPSG:26943" -> lcc("NAD83 / California zone 3", dms(38, 26), dms(37, 4), 36.5, -120.5, 2000000, 500000, probe = (-121.5, 37.7)),
      "EPSG:26944" -> lcc("NAD83 / California zone 4", dms(37, 15), 36, dms(35, 20), -119, 2000000, 500000, probe = (-119.8, 36.7)),
      "EPSG:26945" -> lcc("NAD83 / California zone 5", dms(35, 28), dms(34, 2), 33.5, -118, 2000000, 500000, probe = (-118.25, 34.05)),
      "EPSG:26946" -> lcc("NAD83 / California zone 6", dms(33, 53), dms(32, 47), dms(32, 10), -116.25, 2000000, 500000, probe = (-117.15, 32.7)),
      "EPSG:26953" -> lcc("NAD83 / Colorado North", dms(40, 47), dms(39, 43), dms(39, 20), -105.5, 914401.8289, 304800.6096, probe = (-105, 40.5)),
      "EPSG:26954" -> lcc("NAD83 / Colorado Central", dms(39, 45), dms(38, 27), dms(37, 50), -105.5, 914401.8289, 304800.6096, probe = (-104.99, 39.74)),
      "EPSG:26955" -> lcc("NAD83 / Colorado South", dms(38, 26), dms(37, 14), dms(36, 40), -105.5, 914401.8289, 304800.6096, probe = (-104.8, 37.8)),
      "EPSG:26960" -> lcc("NAD83 / Florida North", dms(30, 45), dms(29, 35), 29, -84.5, 600000, 0, probe = (-84.3, 30.45)),
      "EPSG:26985" -> lcc("NAD83 / Maryland", dms(39, 27), dms(38, 18), dms(37, 40), -77, 400000, 0, probe = (-76.6, 39.3)),
      "EPSG:32100" -> lcc("NAD83 / Montana", 49, 45, 44.25, -109.5, 600000, 0, probe = (-108.5, 45.8)),
      "EPSG:32118" -> lcc("NAD83 / New York Long Island", dms(41, 2), dms(40, 40), dms(40, 10), -74, 300000, 0, probe = (-73.95, 40.75)),
      // ftUS variant; parameters authoritative from the reference's
      // taxi_zones.prj fixture (FE 984250 ftUS)
      "EPSG:2263" -> Crs("NAD83 / New York Long Island (ftUS)",
        new InUnits(new Lcc2SP(Grs80, dms(41, 2), dms(40, 40), dms(40, 10), -74, 0, 0), UsFoot, 984250, 0),
        g, (-73.95, 40.75),
        s"+proj=lcc +lat_1=${dms(41, 2)} +lat_2=${dms(40, 40)} +lat_0=${dms(40, 10)} +lon_0=-74 " +
          "+x_0=300000.0000000001 +y_0=0 +ellps=GRS80 +units=us-ft +no_defs"),
      "EPSG:32126" -> lcc("NAD83 / Oregon North", 46, dms(44, 20), dms(43, 40), -120.5, 2500000, 0, probe = (-122.65, 45.5)),
      "EPSG:32127" -> lcc("NAD83 / Oregon South", 44, dms(42, 20), dms(41, 40), -120.5, 1500000, 0, probe = (-123, 43.2)),
      "EPSG:32128" -> lcc("NAD83 / Pennsylvania North", dms(41, 57), dms(40, 53), dms(40, 10), -77.75, 600000, 0, probe = (-76, 41.3)),
      "EPSG:32129" -> lcc("NAD83 / Pennsylvania South", dms(40, 58), dms(39, 56), dms(39, 20), -77.75, 600000, 0, probe = (-75.16, 39.95)),
      "EPSG:32137" -> lcc("NAD83 / Texas North", dms(36, 11), dms(34, 39), 34, -101.5, 200000, 1000000, probe = (-101.85, 35.2)),
      "EPSG:32138" -> lcc("NAD83 / Texas North Central", dms(33, 58), dms(32, 8), dms(31, 40), -98.5, 600000, 2000000, probe = (-96.8, 32.8)),
      "EPSG:32139" -> lcc("NAD83 / Texas Central", dms(31, 53), dms(30, 7), dms(29, 40), dms(-100, 20), 700000, 3000000, probe = (-97.74, 30.27)),
      "EPSG:32140" -> lcc("NAD83 / Texas South Central", dms(30, 17), dms(28, 23), dms(27, 50), -99, 600000, 4000000, probe = (-95.37, 29.76)),
      "EPSG:32141" -> lcc("NAD83 / Texas South", dms(27, 50), dms(26, 10), dms(25, 40), -98.5, 300000, 5000000, probe = (-97.5, 26.1)),
      "EPSG:32146" -> lcc("NAD83 / Virginia North", dms(39, 12), dms(38, 2), dms(37, 40), -78.5, 3500000, 2000000, probe = (-77.45, 38.85)),
      "EPSG:32147" -> lcc("NAD83 / Virginia South", dms(37, 58), dms(36, 46), dms(36, 20), -78.5, 3500000, 1000000, probe = (-76.3, 36.85)),
      "EPSG:32148" -> lcc("NAD83 / Washington North", dms(48, 44), 47.5, 47, dms(-120, 50), 500000, 0, probe = (-122.33, 47.6)),
      "EPSG:32149" -> lcc("NAD83 / Washington South", dms(47, 20), dms(45, 50), dms(45, 20), -120.5, 500000, 0, probe = (-122.45, 45.65)),
      // ------------------------------------------------- equal-area conic
      "EPSG:5070" -> alb("NAD83 / Conus Albers", 29.5, 45.5, 23, -96, 0, 0, probe = (-96, 38)),
      "EPSG:6350" -> alb("NAD83(2011) / Conus Albers", 29.5, 45.5, 23, -96, 0, 0, probe = (-96, 38)),
      "EPSG:3577" -> alb("GDA94 / Australian Albers", -18, -36, 0, 132, 0, 0, probe = (135, -25)),
      "EPSG:3310" -> alb("NAD83 / California Albers", 34, 40.5, 0, -120, 0, -4000000, probe = (-119.5, 36.5)),
      "EPSG:3338" -> alb("NAD83 / Alaska Albers", 55, 65, 50, -154, 0, 0, probe = (-150, 62)),
      "EPSG:3083" -> alb("NAD83 / Texas Centric Albers Equal Area", 27.5, 35, 18, -100, 1500000, 6000000, probe = (-99, 31)),
      // ------------------------------------------- azimuthal equal-area
      "EPSG:3035" -> laea("ETRS89-extended / LAEA Europe", 52, 10, 4321000, 3210000, probe = (10, 50)),
      "EPSG:3571" -> laea("WGS 84 / North Pole LAEA Bering Sea", 90, 180, 0, 0, w, probe = (-175, 70)),
      "EPSG:3572" -> laea("WGS 84 / North Pole LAEA Alaska", 90, -150, 0, 0, w, probe = (-150, 70)),
      "EPSG:3573" -> laea("WGS 84 / North Pole LAEA Canada", 90, -100, 0, 0, w, probe = (-100, 70)),
      "EPSG:3574" -> laea("WGS 84 / North Pole LAEA Atlantic", 90, -40, 0, 0, w, probe = (-40, 70)),
      "EPSG:3575" -> laea("WGS 84 / North Pole LAEA Europe", 90, 10, 0, 0, w, probe = (10, 70)),
      "EPSG:3576" -> laea("WGS 84 / North Pole LAEA Russia", 90, 90, 0, 0, w, probe = (90, 70)),
      // ----------------------------------------- world (small-scale) CRSes
      // ESRI "World_*" codes on the WGS84 datum. Sinusoidal develops on the
      // full ellipsoid (PROJ `sinu` is ellipsoid-capable); the spherical-only
      // projections take the WGS84 semimajor as sphere radius (PROJ/ESRI
      // convention for these codes).
      "ESRI:54008" -> Crs("World Sinusoidal", new Sinusoidal(Wgs84, 0, 0, 0), w, (10, 30),
        "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "ESRI:54009" -> Crs("World Mollweide", new Mollweide(Wgs84.a, 0, 0, 0), w, (10, 30),
        "+proj=moll +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "ESRI:54012" -> Crs("World Eckert IV", new EckertIv(Wgs84.a, 0, 0, 0), w, (10, 30),
        "+proj=eck4 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "ESRI:54030" -> Crs("World Robinson", new Robinson(Wgs84.a, 0, 0, 0), w, (10, 32.6),
        "+proj=robin +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      // Equal Earth (EPSG method 1078) — the three published aspects
      "EPSG:8857" -> Crs("WGS 84 / Equal Earth Greenwich", new EqualEarth(Wgs84, 0, 0, 0), w, (10, 30),
        "+proj=eqearth +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "EPSG:8858" -> Crs("WGS 84 / Equal Earth Americas", new EqualEarth(Wgs84, -90, 0, 0), w, (-80, 30),
        "+proj=eqearth +lon_0=-90 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "EPSG:8859" -> Crs("WGS 84 / Equal Earth Asia-Pacific", new EqualEarth(Wgs84, 150, 0, 0), w, (140, 30),
        "+proj=eqearth +lon_0=150 +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"),
      "EPSG:6931" -> laea("WGS 84 / NSIDC EASE-Grid 2.0 North", 90, 0, 0, 0, w, probe = (0, 75)),
      "EPSG:6932" -> laea("WGS 84 / NSIDC EASE-Grid 2.0 South", -90, 0, 0, 0, w, probe = (0, -75)),
      // ------------------------------------------------ polar stereographic
      "EPSG:3413" -> Crs("WGS 84 / NSIDC Sea Ice Polar Stereographic North",
        new PolarStereo(Wgs84, 70, -45, 0, 0, north = true), w, (-45, 75),
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3031" -> Crs("WGS 84 / Antarctic Polar Stereographic",
        new PolarStereo(Wgs84, -71, 0, 0, 0, north = false), w, (0, -75),
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3995" -> Crs("WGS 84 / Arctic Polar Stereographic",
        new PolarStereo(Wgs84, 71, 0, 0, 0, north = true), w, (0, 75),
        "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3996" -> Crs("WGS 84 / IBCAO Polar Stereographic",
        new PolarStereo(Wgs84, 75, 0, 0, 0, north = true), w, (0, 80),
        "+proj=stere +lat_0=90 +lat_ts=75 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3976" -> Crs("WGS 84 / NSIDC Sea Ice Polar Stereographic South",
        new PolarStereo(Wgs84, -70, 0, 0, 0, north = false), w, (0, -75),
        "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      // --------------------------------------------- mercator / equal-area
      "EPSG:3395" -> Crs("WGS 84 / World Mercator", new MercatorEll(Wgs84, 0, 0, 0), w, (10, 50),
        "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:6933" -> Crs("WGS 84 / NSIDC EASE-Grid 2.0 Global", new Cea(Wgs84, 30, 0, 0, 0), w, (10, 40),
        "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      // ------------------------------------------- transverse mercator (TM)
      "EPSG:2157" -> tm("IRENET95 / Irish Transverse Mercator", 53.5, -8, 0.99982, 600000, 750000, probe = (-6.26, 53.35)),
      "EPSG:2180" -> tm("ETRS89 / Poland CS92", 0, 19, 0.9993, 500000, -5300000, probe = (21, 52.2)),
      "EPSG:2193" -> tm("NZGD2000 / New Zealand Transverse Mercator 2000", 0, 173, 0.9996, 1600000, 10000000, probe = (174.78, -41.29)),
      // legacy NZ national grid: the Reilly complex-polynomial conformal
      // projection (method 9811) on NZGD49
      "EPSG:27200" -> Crs("NZGD49 / New Zealand Map Grid",
        new Nzmg(2510000, 6023150), DatumNzgd49, probe = (174.78, -41.29),
        s"+proj=nzmg +lat_0=-41 +lon_0=173 +x_0=2510000 +y_0=6023150 " +
          s"${datumTags(DatumNzgd49)} +units=m +no_defs"),
      "EPSG:3006" -> tm("SWEREF99 TM", 0, 15, 0.9996, 500000, 0, probe = (18.07, 59.33)),
      "EPSG:3067" -> tm("ETRS89 / TM35FIN(E,N)", 0, 27, 0.9996, 500000, 0, probe = (24.94, 60.17)),
      "EPSG:3763" -> tm("ETRS89 / Portugal TM06", dms(39, 40, 5.73), dms(-8, 7, 59.19), 1, 0, 0, probe = (-9.14, 38.71)),
      "EPSG:5179" -> tm("Korea 2000 / Unified CS", 38, 127.5, 0.9996, 1000000, 2000000, probe = (126.98, 37.57)),
      "EPSG:3414" -> tm("SVY21 / Singapore TM", dms(1, 22), dms(103, 50), 1, 28001.642, 38744.572, DatumWgs84, probe = (103.85, 1.29)),
      // US state plane (NAD83, meters) — TM zones
      "EPSG:26929" -> tm("NAD83 / Alabama East", 30.5, dms(-85, 50), 0.99996, 200000, 0, probe = (-86.3, 32.37)),
      "EPSG:26930" -> tm("NAD83 / Alabama West", 30, -87.5, 1 - 1.0 / 15000, 600000, 0, probe = (-86.8, 33.52)),
      "EPSG:26948" -> tm("NAD83 / Arizona East", 31, dms(-110, 10), 0.9999, 213360, 0, probe = (-110.93, 32.22)),
      "EPSG:26949" -> tm("NAD83 / Arizona Central", 31, dms(-111, 55), 0.9999, 213360, 0, probe = (-112.07, 33.45)),
      "EPSG:26950" -> tm("NAD83 / Arizona West", 31, dms(-113, 45), 0.9999, 213360, 0, probe = (-114.6, 32.73)),
      "EPSG:26958" -> tm("NAD83 / Florida East", dms(24, 20), -81, 1 - 1.0 / 17000, 200000, 0, probe = (-80.19, 25.76)),
      "EPSG:26959" -> tm("NAD83 / Florida West", dms(24, 20), -82, 1 - 1.0 / 17000, 200000, 0, probe = (-82.46, 27.95)),
      "EPSG:26966" -> tm("NAD83 / Georgia East", 30, dms(-82, 10), 0.9999, 200000, 0, probe = (-81.1, 32.08)),
      "EPSG:26967" -> tm("NAD83 / Georgia West", 30, dms(-84, 10), 0.9999, 700000, 0, probe = (-84.39, 33.75)),
      "EPSG:26971" -> tm("NAD83 / Illinois East", dms(36, 40), dms(-88, 20), 1 - 1.0 / 40000, 300000, 0, probe = (-87.63, 41.88)),
      "EPSG:26972" -> tm("NAD83 / Illinois West", dms(36, 40), dms(-90, 10), 1 - 1.0 / 17000, 700000, 0, probe = (-89.65, 39.8)),
      "EPSG:32115" -> tm("NAD83 / New York East", dms(38, 50), -74.5, 0.9999, 150000, 0, probe = (-74.05, 41)),
      "EPSG:32116" -> tm("NAD83 / New York Central", 40, dms(-76, 35), 0.9999375, 250000, 0, probe = (-76.15, 43.05)),
      "EPSG:32117" -> tm("NAD83 / New York West", 40, dms(-78, 35), 0.9999375, 350000, 0, probe = (-78.88, 42.89)),
      // ------------------------------------- legacy datums (Helmert shift)
      "EPSG:27700" -> tm("OSGB36 / British National Grid", 49, -2, 0.9996012717, 400000, -100000, DatumOsgb36, probe = (-0.13, 51.5)),
      "EPSG:29903" -> tm("TM75 / Irish Grid", 53.5, -8, 1.000035, 200000, 250000, DatumTm75, probe = (-6.26, 53.35)),
      // TM65 and TM75 share the 1965-adjustment grid at this chain's accuracy
      "EPSG:29902" -> tm("TM65 / Irish Grid", 53.5, -8, 1.000035, 200000, 250000, DatumTm75, probe = (-6.26, 53.35)),
      // ---------------------------------------- oblique Mercator (Hotine)
      // EPSG GN7-2's own worked example CRS (variant B), validated against
      // its published test point in ProjRegistrySpec
      "EPSG:29873" -> Crs("Timbalai 1948 / RSO Borneo (m)",
        new Omerc(Everest1967, 4, 115, dms(53, 18, 56.9537), dms(53, 7, 48.3685),
          0.99984, 590476.87, 442857.65, variantA = false),
        DatumTimbalai, probe = (115.0, 5.0),
        s"+proj=omerc +lat_0=4 +lonc=115 +alpha=${dms(53, 18, 56.9537)} " +
          s"+gamma=${dms(53, 7, 48.3685)} +k=0.99984 +x_0=590476.87 +y_0=442857.65 " +
          s"${datumTags(DatumTimbalai)} +units=m +no_defs"),
      // ------------------------------------ Swiss double projection (9814)
      "EPSG:2056" -> Crs("CH1903+ / LV95",
        new Somerc(Bessel1841, dms(46, 57, 8.66), dms(7, 26, 22.5), 1.0, 2600000, 1200000),
        DatumCh1903, probe = (8.54, 47.38),
        s"+proj=somerc +lat_0=${dms(46, 57, 8.66)} +lon_0=${dms(7, 26, 22.5)} +k_0=1 " +
          s"+x_0=2600000 +y_0=1200000 ${datumTags(DatumCh1903)} +units=m +no_defs"),
      "EPSG:21781" -> Crs("CH1903 / LV03",
        new Somerc(Bessel1841, dms(46, 57, 8.66), dms(7, 26, 22.5), 1.0, 600000, 200000),
        DatumCh1903, probe = (8.54, 47.38),
        s"+proj=somerc +lat_0=${dms(46, 57, 8.66)} +lon_0=${dms(7, 26, 22.5)} +k_0=1 " +
          s"+x_0=600000 +y_0=200000 ${datumTags(DatumCh1903)} +units=m +no_defs"),
      // RD New (Netherlands, EPSG method 9809 Oblique Stereographic): the
      // EPSG GN7-2 worked-example CRS, pinned in ProjRegistrySpec
      "EPSG:28992" -> Crs("Amersfoort / RD New",
        new Sterea(Bessel1841, dms(52, 9, 22.178), dms(5, 23, 15.5),
          0.9999079, 155000, 463000),
        DatumAmersfoort, probe = (5.38, 52.16),
        s"+proj=sterea +lat_0=${dms(52, 9, 22.178)} +lon_0=${dms(5, 23, 15.5)} " +
          s"+k=0.9999079 +x_0=155000 +y_0=463000 ${datumTags(DatumAmersfoort)} +units=m +no_defs"),
      // EOV (Hungary, EPSG method 9815 with α=γ=90° — the documented
      // Hotine special case): HD72 datum on GRS 1967
      "EPSG:23700" -> Crs("HD72 / EOV",
        new Omerc(Grs67, dms(47, 8, 39.8174), dms(19, 2, 54.8584), 90, 90,
          0.99993, 650000, 200000, variantA = false),
        DatumHd72, probe = (19.05, 47.5),
        s"+proj=omerc +lat_0=${dms(47, 8, 39.8174)} +lonc=${dms(19, 2, 54.8584)} " +
          s"+alpha=90 +gamma=90 +k=0.99993 +x_0=650000 +y_0=200000 " +
          s"${datumTags(DatumHd72)} +units=m +no_defs"),
      // ----------------------------------------------------- Krovak (9819)
      // EPSG:5514 = S-JTSK / Krovak East North: the ENU-facing negation of
      // the south/west grid (kernel emits it directly). λ0 = 42°30' east of
      // Ferro = 24°50' east of Greenwich.
      "EPSG:5514" -> Crs("S-JTSK / Krovak East North",
        new Krovak(Bessel1841, 49.5, dms(24, 50), dms(30, 17, 17.3031), 78.5, 0.9999, 0, 0),
        DatumSjtsk, probe = (16.85, 50.21),
        s"+proj=krovak +lat_0=49.5 +lon_0=${dms(24, 50)} +alpha=${dms(30, 17, 17.3031)} " +
          s"+k=0.9999 +x_0=0 +y_0=0 ${datumTags(DatumSjtsk)} +units=m +no_defs"),
      // ------------------------------------------- Cassini-Soldner (9806)
      // The EPSG GN7-2 worked-example CRS (Clarke's links; FE/FN in links),
      // pinned in ProjRegistrySpec
      "EPSG:30200" -> Crs("Trinidad 1903 / Trinidad Grid",
        new InUnits(new CassiniSoldner(Clarke1858, dms(10, 26, 30), dms(-61, 20), 0, 0),
          ClarkeLink, 430000, 325000),
        DatumTrinidad, probe = (-61.4, 10.5),
        s"+proj=cass +lat_0=${dms(10, 26, 30)} +lon_0=${dms(-61, 20)} +x_0=86501.46392052001 " +
          s"+y_0=65379.0134283 ${datumTags(DatumTrinidad)} +to_meter=$ClarkeLink +no_defs"),
      // --------------------------------------------- American Polyconic (9818)
      "EPSG:5880" -> Crs("SIRGAS 2000 / Brazil Polyconic",
        new Polyconic(Grs80, 0, -54, 5000000, 10000000),
        DatumGrs80, probe = (-47.9, -15.8),
        "+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 +ellps=GRS80 +units=m +no_defs"),
      "EPSG:29101" -> Crs("SAD69 / Brazil Polyconic",
        new Polyconic(Grs67Mod, 0, -54, 5000000, 10000000),
        DatumSad69, probe = (-47.9, -15.8),
        s"+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 " +
          s"${datumTags(DatumSad69)} +units=m +no_defs"),
      // ------------------------------------- Equidistant Cylindrical (1028)
      // GN7-2's own worked-example CRS, pinned in ProjRegistrySpec
      "EPSG:4087" -> Crs("WGS 84 / World Equidistant Cylindrical",
        new EquidistantCyl(Wgs84, 0, 0, 0, 0), w, (10, 55),
        "+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      // the superseded Plate Carree spelling of the same grid (still the
      // code a lot of legacy data carries)
      "EPSG:32662" -> Crs("WGS 84 / Plate Carree",
        new EquidistantCyl(Wgs84, 0, 0, 0, 0), w, (10, 55),
        "+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      // --------------------------------------------- Guam projection (9831)
      // GN7-2's worked-example CRS, pinned in ProjRegistrySpec
      "EPSG:3993" -> Crs("Guam 1963 / Guam SPCS",
        new GuamAzEq(Clarke1866, dms(13, 28, 20.87887), dms(144, 44, 55.50254), 50000, 50000),
        DatumGuam, probe = (144.75, 13.45),
        s"+proj=aeqd +guam +lat_0=${dms(13, 28, 20.87887)} +lon_0=${dms(144, 44, 55.50254)} " +
          s"+x_0=50000 +y_0=50000 ${datumTags(DatumGuam)} +units=m +no_defs"))

    // Hartebeesthoek94 / Lo15..Lo33 (EPSG:2046-2055): South African survey
    // grid — TM 1SP k=1 on odd central meridians, SOUTH-ORIENTED axes
    // (EPSG method 9808; westing/southing)
    val loZones = (0 to 9).map { i =>
      val lon0 = 15 + 2 * i
      s"EPSG:${2046 + i}" -> Crs(s"Hartebeesthoek94 / Lo$lon0",
        new SouthOriented(new TransMerc(Grs80, 0, lon0, 1.0, 0, 0)),
        DatumGrs80, probe = (lon0 + 0.4, -29.5),
        s"+proj=tmerc +lat_0=0 +lon_0=$lon0 +k=1 +x_0=0 +y_0=0 +axis=wsu +ellps=GRS80 +units=m +no_defs")
    }.toMap

    // JGD2000 (EPSG:2443-2461) and JGD2011 (EPSG:6669-6687) Japan Plane
    // Rectangular CS zones I-XIX: TM k0=0.9999, FE=FN=0, per-zone origins.
    val jpOrigins = Seq(
      (33.0, 129.5), (33.0, 131.0), (36.0, dms(132, 10)), (33.0, 133.5),
      (36.0, dms(134, 20)), (36.0, 136.0), (36.0, dms(137, 10)), (36.0, 138.5),
      (36.0, dms(139, 50)), (40.0, dms(140, 50)), (44.0, dms(140, 15)),
      (44.0, dms(142, 15)), (44.0, dms(144, 15)), (26.0, 142.0), (26.0, 127.5),
      (26.0, 124.0), (26.0, 131.0), (20.0, 136.0), (26.0, 154.0))
    val japan = jpOrigins.zipWithIndex.flatMap { case ((lat0, lon0), i) =>
      val zone = (i + 1).toString // EPSG names use roman numerals; digits here
      val probe = (lon0 + 0.3, lat0 + 0.3)
      Seq(
        s"EPSG:${2443 + i}" -> tm(s"JGD2000 / Japan Plane Rectangular CS $zone", lat0, lon0, 0.9999, 0, 0, probe = probe),
        s"EPSG:${6669 + i}" -> tm(s"JGD2011 / Japan Plane Rectangular CS $zone", lat0, lon0, 0.9999, 0, 0, probe = probe))
    }.toMap

    // RGF93 / CC42..CC50 (EPSG:3942-3950): one LCC-2SP per degree of latitude
    val franceCC = (0 to 8).map { i =>
      val lat0 = 42.0 + i
      s"EPSG:${3942 + i}" -> lcc(s"RGF93 v1 / CC${42 + i}", lat0 - 0.75, lat0 + 0.75,
        lat0, 3, 1700000, 1200000 + i * 1000000, probe = (3.0, lat0 + 0.2))
    }.toMap

    // ------------- US State Plane (SPCS83, NAD83 meters) — set completion
    // (round 9). Parameters from the public EPSG dataset / NGS SP 5-4; zone
    // math is the TM/LCC kernel already validated on the earlier zones.
    val usSpcsTm = Map(
      "EPSG:26957" -> tm("NAD83 / Delaware", 38, dms(-75, 25), 1 - 1.0 / 200000, 200000, 0, probe = (-75.5, 39.1)),
      "EPSG:26961" -> tm("NAD83 / Hawaii zone 1", dms(18, 50), dms(-155, 30), 1 - 1.0 / 30000, 500000, 0, probe = (-155.2, 19.6)),
      "EPSG:26962" -> tm("NAD83 / Hawaii zone 2", dms(20, 20), dms(-156, 40), 1 - 1.0 / 30000, 500000, 0, probe = (-156.4, 20.8)),
      "EPSG:26963" -> tm("NAD83 / Hawaii zone 3", dms(21, 10), -158, 1 - 1.0 / 100000, 500000, 0, probe = (-157.9, 21.4)),
      "EPSG:26964" -> tm("NAD83 / Hawaii zone 4", dms(21, 50), dms(-159, 30), 1 - 1.0 / 100000, 500000, 0, probe = (-159.4, 22.05)),
      "EPSG:26965" -> tm("NAD83 / Hawaii zone 5", dms(21, 40), dms(-160, 10), 1.0, 500000, 0, probe = (-160.1, 21.9)),
      "EPSG:26968" -> tm("NAD83 / Idaho East", dms(41, 40), dms(-112, 10), 1 - 1.0 / 19000, 200000, 0, probe = (-112, 43)),
      "EPSG:26969" -> tm("NAD83 / Idaho Central", dms(41, 40), -114, 1 - 1.0 / 19000, 500000, 0, probe = (-114.2, 43.6)),
      "EPSG:26970" -> tm("NAD83 / Idaho West", dms(41, 40), dms(-115, 45), 1 - 1.0 / 15000, 800000, 0, probe = (-116.2, 43.6)),
      "EPSG:26973" -> tm("NAD83 / Indiana East", 37.5, dms(-85, 40), 1 - 1.0 / 30000, 100000, 250000, probe = (-85.9, 39.8)),
      "EPSG:26974" -> tm("NAD83 / Indiana West", 37.5, dms(-87, 5), 1 - 1.0 / 30000, 900000, 250000, probe = (-87.2, 39.5)),
      "EPSG:26983" -> tm("NAD83 / Maine East", dms(43, 40), -68.5, 1 - 1.0 / 10000, 300000, 0, probe = (-68.8, 44.8)),
      "EPSG:26984" -> tm("NAD83 / Maine West", dms(42, 50), dms(-70, 10), 1 - 1.0 / 30000, 900000, 0, probe = (-70.3, 43.7)),
      "EPSG:26994" -> tm("NAD83 / Mississippi East", 29.5, dms(-88, 50), 1 - 1.0 / 20000, 300000, 0, probe = (-88.8, 32.3)),
      "EPSG:26995" -> tm("NAD83 / Mississippi West", 29.5, dms(-90, 20), 1 - 1.0 / 20000, 700000, 0, probe = (-90.2, 32.3)),
      "EPSG:26996" -> tm("NAD83 / Missouri East", dms(35, 50), -90.5, 1 - 1.0 / 15000, 250000, 0, probe = (-90.2, 38.6)),
      "EPSG:26997" -> tm("NAD83 / Missouri Central", dms(35, 50), -92.5, 1 - 1.0 / 15000, 500000, 0, probe = (-92.2, 38.6)),
      "EPSG:26998" -> tm("NAD83 / Missouri West", dms(36, 10), -94.5, 1 - 1.0 / 17000, 850000, 0, probe = (-94.6, 39.1)),
      "EPSG:32107" -> tm("NAD83 / Nevada East", dms(34, 45), dms(-115, 35), 1 - 1.0 / 10000, 200000, 8000000, probe = (-115.1, 36.2)),
      "EPSG:32108" -> tm("NAD83 / Nevada Central", dms(34, 45), dms(-116, 40), 1 - 1.0 / 10000, 500000, 6000000, probe = (-117.2, 38.1)),
      "EPSG:32109" -> tm("NAD83 / Nevada West", dms(34, 45), dms(-118, 35), 1 - 1.0 / 10000, 800000, 4000000, probe = (-119.8, 39.5)),
      "EPSG:32110" -> tm("NAD83 / New Hampshire", 42.5, dms(-71, 40), 1 - 1.0 / 30000, 300000, 0, probe = (-71.5, 43.2)),
      "EPSG:32111" -> tm("NAD83 / New Jersey", dms(38, 50), -74.5, 0.9999, 150000, 0, probe = (-74.4, 40.2)),
      "EPSG:32112" -> tm("NAD83 / New Mexico East", 31, dms(-104, 20), 1 - 1.0 / 11000, 165000, 0, probe = (-104.3, 32.9)),
      "EPSG:32113" -> tm("NAD83 / New Mexico Central", 31, dms(-106, 15), 0.9999, 500000, 0, probe = (-106.6, 35.1)),
      "EPSG:32114" -> tm("NAD83 / New Mexico West", 31, dms(-107, 50), 1 - 1.0 / 12000, 830000, 0, probe = (-108.2, 35.1)),
      "EPSG:32130" -> tm("NAD83 / Rhode Island", dms(41, 5), -71.5, 1 - 1.0 / 160000, 100000, 0, probe = (-71.4, 41.8)),
      "EPSG:32145" -> tm("NAD83 / Vermont", 42.5, -72.5, 1 - 1.0 / 28000, 500000, 0, probe = (-72.6, 44.3)),
      "EPSG:32155" -> tm("NAD83 / Wyoming East", 40.5, dms(-105, 10), 1 - 1.0 / 16000, 200000, 0, probe = (-104.8, 41.1)),
      "EPSG:32156" -> tm("NAD83 / Wyoming East Central", 40.5, dms(-107, 20), 1 - 1.0 / 16000, 400000, 100000, probe = (-107.3, 43.0)),
      "EPSG:32157" -> tm("NAD83 / Wyoming West Central", 40.5, dms(-108, 45), 1 - 1.0 / 16000, 600000, 0, probe = (-108.7, 42.8)),
      "EPSG:32158" -> tm("NAD83 / Wyoming West", 40.5, dms(-110, 5), 1 - 1.0 / 16000, 800000, 100000, probe = (-110.7, 41.3))
    ) ++ (2 to 9).map { z =>
      val lon0 = -142.0 - 4 * (z - 2)
      s"EPSG:${26930 + z}" -> tm(s"NAD83 / Alaska zone $z", 54, lon0, 0.9999, 500000, 0,
        probe = (lon0 + 0.5, 63.0))
    }.toMap

    val usSpcsLcc = Map(
      "EPSG:26940" -> lcc("NAD83 / Alaska zone 10", dms(51, 50), dms(53, 50), 51, -176, 1000000, 0, probe = (-175.5, 52.5)),
      "EPSG:26951" -> lcc("NAD83 / Arkansas North", dms(34, 56), dms(36, 14), dms(34, 20), -92, 400000, 0, probe = (-92.3, 35.5)),
      "EPSG:26952" -> lcc("NAD83 / Arkansas South", dms(33, 18), dms(34, 46), dms(32, 40), -92, 400000, 400000, probe = (-92.2, 33.6)),
      "EPSG:26956" -> lcc("NAD83 / Connecticut", dms(41, 12), dms(41, 52), dms(40, 50), dms(-72, 45), 304800.6096, 152400.3048, probe = (-72.7, 41.6)),
      "EPSG:26975" -> lcc("NAD83 / Iowa North", dms(42, 4), dms(43, 16), 41.5, -93.5, 1500000, 1000000, probe = (-93.6, 42.5)),
      "EPSG:26976" -> lcc("NAD83 / Iowa South", dms(40, 37), dms(41, 47), 40, -93.5, 500000, 0, probe = (-93.6, 41.0)),
      "EPSG:26977" -> lcc("NAD83 / Kansas North", dms(38, 43), dms(39, 47), dms(38, 20), -98, 400000, 0, probe = (-97.6, 39.0)),
      "EPSG:26978" -> lcc("NAD83 / Kansas South", dms(37, 16), dms(38, 34), dms(36, 40), -98.5, 400000, 400000, probe = (-97.3, 37.7)),
      "EPSG:26979" -> lcc("NAD83 / Kentucky North", dms(37, 58), dms(38, 58), 37.5, -84.25, 500000, 0, probe = (-84.5, 38.2)),
      "EPSG:2205" -> lcc("NAD83 / Kentucky North", dms(37, 58), dms(38, 58), 37.5, -84.25, 500000, 0, probe = (-84.5, 38.2)),
      "EPSG:26980" -> lcc("NAD83 / Kentucky South", dms(36, 44), dms(37, 56), dms(36, 20), -85.75, 500000, 500000, probe = (-85.7, 37.1)),
      "EPSG:3088" -> lcc("NAD83 / Kentucky Single Zone", dms(37, 5), dms(38, 40), dms(36, 20), -85.75, 1500000, 1000000, probe = (-85.7, 37.5)),
      "EPSG:26981" -> lcc("NAD83 / Louisiana North", dms(31, 10), dms(32, 40), 30.5, -92.5, 1000000, 0, probe = (-92.5, 32.5)),
      "EPSG:26982" -> lcc("NAD83 / Louisiana South", dms(29, 18), dms(30, 42), 28.5, dms(-91, 20), 1000000, 0, probe = (-90.1, 30.0)),
      "EPSG:26986" -> lcc("NAD83 / Massachusetts Mainland", dms(41, 43), dms(42, 41), 41, -71.5, 200000, 750000, probe = (-71.06, 42.36)),
      "EPSG:26987" -> lcc("NAD83 / Massachusetts Island", dms(41, 17), dms(41, 29), 41, -70.5, 500000, 0, probe = (-70.6, 41.4)),
      "EPSG:26988" -> lcc("NAD83 / Michigan North", dms(45, 29), dms(47, 5), dms(44, 47), -87, 8000000, 0, probe = (-87.1, 46.3)),
      "EPSG:26989" -> lcc("NAD83 / Michigan Central", dms(44, 11), dms(45, 42), dms(43, 19), dms(-84, 22), 6000000, 0, probe = (-84.6, 44.8)),
      "EPSG:26990" -> lcc("NAD83 / Michigan South", dms(42, 6), dms(43, 40), 41.5, dms(-84, 22), 4000000, 0, probe = (-83.7, 42.7)),
      "EPSG:26991" -> lcc("NAD83 / Minnesota North", dms(47, 2), dms(48, 38), 46.5, dms(-93, 6), 800000, 100000, probe = (-93.4, 47.8)),
      "EPSG:26992" -> lcc("NAD83 / Minnesota Central", dms(45, 37), dms(47, 3), 45, dms(-94, 15), 800000, 100000, probe = (-94.2, 46.0)),
      "EPSG:26993" -> lcc("NAD83 / Minnesota South", dms(43, 47), dms(45, 13), 43, -94, 800000, 100000, probe = (-93.1, 44.0)),
      "EPSG:32104" -> lcc("NAD83 / Nebraska", 40, 43, dms(39, 50), -100, 500000, 0, probe = (-96.7, 41.25)),
      "EPSG:32119" -> lcc("NAD83 / North Carolina", dms(34, 20), dms(36, 10), dms(33, 45), -79, 609601.22, 0, probe = (-78.6, 35.8)),
      "EPSG:32120" -> lcc("NAD83 / North Dakota North", dms(47, 26), dms(48, 44), 47, -100.5, 600000, 0, probe = (-100.8, 48.2)),
      "EPSG:32121" -> lcc("NAD83 / North Dakota South", dms(46, 11), dms(47, 29), dms(45, 40), -100.5, 600000, 0, probe = (-100.8, 46.8)),
      "EPSG:32122" -> lcc("NAD83 / Ohio North", dms(40, 26), dms(41, 42), dms(39, 40), -82.5, 600000, 0, probe = (-81.7, 41.4)),
      "EPSG:32123" -> lcc("NAD83 / Ohio South", dms(38, 44), dms(40, 2), 38, -82.5, 600000, 0, probe = (-83.0, 39.1)),
      "EPSG:32124" -> lcc("NAD83 / Oklahoma North", dms(35, 34), dms(36, 46), 35, -98, 600000, 0, probe = (-97.5, 36.1)),
      "EPSG:32125" -> lcc("NAD83 / Oklahoma South", dms(33, 56), dms(35, 14), dms(33, 20), -98, 600000, 0, probe = (-97.5, 34.6)),
      "EPSG:32133" -> lcc("NAD83 / South Carolina", 32.5, dms(34, 50), dms(31, 50), -81, 609600, 0, probe = (-81.0, 34.0)),
      "EPSG:32134" -> lcc("NAD83 / South Dakota North", dms(44, 25), dms(45, 41), dms(43, 50), -100, 600000, 0, probe = (-100.3, 44.9)),
      "EPSG:32135" -> lcc("NAD83 / South Dakota South", dms(42, 50), dms(44, 24), dms(42, 20), dms(-100, 20), 600000, 0, probe = (-103.2, 43.5)),
      "EPSG:32136" -> lcc("NAD83 / Tennessee", dms(35, 15), dms(36, 25), dms(34, 20), -86, 600000, 0, probe = (-86.8, 36.16)),
      "EPSG:32142" -> lcc("NAD83 / Utah North", dms(40, 43), dms(41, 47), dms(40, 20), -111.5, 500000, 1000000, probe = (-111.9, 41.0)),
      "EPSG:32143" -> lcc("NAD83 / Utah Central", dms(39, 1), dms(40, 39), dms(38, 20), -111.5, 500000, 2000000, probe = (-111.9, 39.5)),
      "EPSG:32144" -> lcc("NAD83 / Utah South", dms(37, 13), dms(38, 21), dms(36, 40), -111.5, 500000, 3000000, probe = (-113.1, 37.7)),
      "EPSG:32150" -> lcc("NAD83 / West Virginia North", 39, dms(40, 15), 38.5, -79.5, 600000, 0, probe = (-80.0, 39.5)),
      "EPSG:32151" -> lcc("NAD83 / West Virginia South", dms(37, 29), dms(38, 53), 37, -81, 600000, 0, probe = (-81.6, 38.3)),
      "EPSG:32152" -> lcc("NAD83 / Wisconsin North", dms(45, 34), dms(46, 46), dms(45, 10), -90, 600000, 0, probe = (-89.4, 45.9)),
      "EPSG:32153" -> lcc("NAD83 / Wisconsin Central", dms(44, 15), dms(45, 30), dms(43, 50), -90, 600000, 0, probe = (-89.4, 44.8)),
      "EPSG:32154" -> lcc("NAD83 / Wisconsin South", dms(42, 44), dms(44, 4), 42, -90, 600000, 0, probe = (-89.4, 43.1)),
      "EPSG:32161" -> lcc("NAD83 / Puerto Rico & Virgin Is.", dms(18, 2), dms(18, 26), dms(17, 50), dms(-66, 26), 200000, 200000, probe = (-66.1, 18.4)),
      // Alaska zone 1: Hotine oblique Mercator variant A (EPSG 9812) along
      // the panhandle axis, azimuth 323°07'48.3685"
      "EPSG:26931" -> Crs("NAD83 / Alaska zone 1",
        new Omerc(Grs80, 57, dms(-133, 40), dms(323, 7, 48.3685), dms(323, 7, 48.3685),
          0.9999, 5000000, -5000000, variantA = true),
        g, (-134.4, 58.3),
        s"+proj=omerc +no_uoff +lat_0=57 +lonc=${dms(-133, 40)} +alpha=${dms(323, 7, 48.3685)} " +
          s"+gamma=${dms(323, 7, 48.3685)} +k=0.9999 +x_0=5000000 +y_0=-5000000 " +
          "+ellps=GRS80 +units=m +no_defs"))

    // ------------------------- European national grids (round 9)
    // NTF Lambert zones: LCC 1SP on Clarke 1880 (IGN); the Paris prime
    // meridian (2°20'14.025" east of Greenwich) is folded into lon_0
    val parisLon = dms(2, 20, 14.025)
    val europe = Map(
      "EPSG:2100" -> tm("GGRS87 / Greek Grid", 0, 24, 0.9996, 500000, 0, DatumGgrs87, probe = (23.7, 38.0)),
      "EPSG:3346" -> tm("LKS94 / Lithuania TM", 0, 24, 0.9998, 500000, 0, probe = (25.3, 54.7)),
      "EPSG:3059" -> tm("LKS92 / Latvia TM", 0, 24, 0.9996, 500000, -6000000, probe = (24.1, 56.95)),
      "EPSG:3301" -> lcc("Estonian Coordinate System of 1997", dms(59, 20), 58, dms(57, 31, 3.19415), 24, 500000, 6375000, probe = (24.75, 59.43)),
      "EPSG:31370" -> lcc("BD72 / Belgian Lambert 72", dms(51, 10, 0.00204), dms(49, 50, 0.00204), 90, dms(4, 22, 2.952), 150000.013, 5400088.438, DatumBd72, probe = (4.35, 50.85)),
      "EPSG:27561" -> lcc1("NTF (Paris) / Lambert Nord France", 49.5, parisLon, 0.999877341, 600000, 200000, DatumNtf, probe = (2.35, 49.5)),
      "EPSG:27562" -> lcc1("NTF (Paris) / Lambert Centre France", 46.8, parisLon, 0.99987742, 600000, 200000, DatumNtf, probe = (2.35, 46.8)),
      "EPSG:27563" -> lcc1("NTF (Paris) / Lambert Sud France", 44.1, parisLon, 0.999877499, 600000, 200000, DatumNtf, probe = (2.35, 44.1)),
      "EPSG:27571" -> lcc1("NTF (Paris) / Lambert zone I", 49.5, parisLon, 0.999877341, 600000, 1200000, DatumNtf, probe = (2.35, 49.5)),
      "EPSG:27572" -> lcc1("NTF (Paris) / Lambert zone II", 46.8, parisLon, 0.99987742, 600000, 2200000, DatumNtf, probe = (2.35, 46.8)),
      "EPSG:27573" -> lcc1("NTF (Paris) / Lambert zone III", 44.1, parisLon, 0.999877499, 600000, 3200000, DatumNtf, probe = (2.35, 44.1))
    ) ++ (2 to 5).map { z =>
      // DHDN 3-degree Gauss-Krüger zones 2-5 (Germany West; Bessel)
      s"EPSG:${31464 + z}" -> tm(s"DHDN / 3-degree Gauss-Kruger zone $z", 0, 3 * z, 1.0,
        z * 1e6 + 500000, 0, DatumDhdn, probe = (3.0 * z + 0.7, 51.0))
    }.toMap ++ (0 to 2).flatMap { i =>
      // MGI / Austria Gauss-Krüger: plain (FN=-5e6) and M28/M31/M34 spellings
      val l0 = Seq(dms(10, 20), dms(13, 20), dms(16, 20))(i)
      val nm = Seq("West", "Central", "East")(i)
      val probe = (l0 + 0.3, 47.5)
      Seq(
        s"EPSG:${31254 + i}" -> tm(s"MGI / Austria GK $nm", 0, l0, 1.0, 0, -5000000, DatumMgi, probe = probe),
        s"EPSG:${31257 + i}" -> tm(s"MGI / Austria GK M${Seq(28, 31, 34)(i)}", 0, l0, 1.0,
          150000 + 300000 * i, -5000000, DatumMgi, probe = probe))
    }.toMap

    // Universal Polar Stereographic (EPSG 9810 variant A, k0=0.994 at the
    // pole): the (N,E) and (E,N) axis-order codes share one kernel —
    // always_xy output is easting/northing either way
    val ups = {
      def upsCrs(name: String, north: Boolean) =
        Crs(name, new PolarStereoA(Wgs84, 0.994, 0, 2000000, 2000000, north), w,
          (30.0, if (north) 80.0 else -80.0),
          s"+proj=stere +lat_0=${if (north) 90 else -90} +k=0.994 +x_0=2000000 +y_0=2000000 " +
            "+ellps=WGS84 +units=m +no_defs")
      Map(
        "EPSG:32661" -> upsCrs("WGS 84 / UPS North (N,E)", north = true),
        "EPSG:5041" -> upsCrs("WGS 84 / UPS North (E,N)", north = true),
        "EPSG:32761" -> upsCrs("WGS 84 / UPS South (N,E)", north = false),
        "EPSG:5042" -> upsCrs("WGS 84 / UPS South (E,N)", north = false))
    }

    // --------------- round 9, batch 2: Asia-Pacific + Nordic + Canada grids
    // (parameters from the public EPSG dataset; every kernel already
    // validated by GN7-2/Snyder worked examples above)
    val asiaPacific = Map(
      "EPSG:2039" -> tm("Israel 1993 / Israeli TM Grid", dms(31, 44, 3.817), dms(35, 12, 16.261),
        1.0000067, 219529.584, 626907.39, DatumIsrael93, probe = (34.78, 32.08)),
      "EPSG:2326" -> tm("Hong Kong 1980 Grid System", dms(22, 18, 43.68), dms(114, 10, 42.8),
        1.0, 836694.05, 819069.8, DatumHk80, probe = (114.17, 22.3)),
      "EPSG:5185" -> tm("Korea 2000 / West Belt 2010", 38, 125, 1.0, 200000, 600000, probe = (125.7, 37.0)),
      "EPSG:5186" -> tm("Korea 2000 / Central Belt 2010", 38, 127, 1.0, 200000, 600000, probe = (126.98, 37.57)),
      "EPSG:5187" -> tm("Korea 2000 / East Belt 2010", 38, 129, 1.0, 200000, 600000, probe = (129.03, 35.18)),
      "EPSG:5188" -> tm("Korea 2000 / East Sea Belt 2010", 38, 131, 1.0, 200000, 600000, probe = (130.9, 37.5)))

    val europe2 = Map(
      "EPSG:3765" -> tm("HTRS96 / Croatia TM", 0, 16.5, 0.9999, 500000, 0, probe = (15.98, 45.81)),
      "EPSG:3794" -> tm("Slovenia 1996 / Slovene National Grid", 0, 15, 0.9999, 500000, -5000000, probe = (14.51, 46.06)),
      "EPSG:2169" -> tm("Luxembourg 1930 / Gauss", dms(49, 50), dms(6, 10), 1.0, 80000, 100000, DatumLux30, probe = (6.13, 49.61)),
      "EPSG:3057" -> lcc("ISN93 / Lambert 1993", 64.25, 65.75, 65, -19, 500000, 500000, probe = (-21.9, 64.15))) ++
      // MGI / Balkans Gauss-Krüger zones 5-8 (k=0.9999, zone-prefixed FE)
      (5 to 8).map { z =>
        s"EPSG:${31270 + z}" -> tm(s"MGI 1901 / Balkans zone $z", 0, 3 * z, 0.9999,
          z * 1e6 + 500000, 0, DatumMgi1901, probe = (3.0 * z + 0.5, 44.0))
      }.toMap ++
      // TUREF 3-degree TM zones (Turkey; GRS80, TM27..TM45)
      (0 to 6).map { i =>
        val l0 = 27 + 3 * i
        s"EPSG:${5253 + i}" -> tm(s"TUREF / 3-degree Gauss-Kruger TM$l0", 0, l0, 1.0,
          500000, 0, probe = (l0 + 0.4, 39.0))
      }.toMap ++
      // SWEREF99 local projection zones (tmerc k=1, FE=150000)
      Vector(12.0, 13.5, 15.0, 16.5, 18.0, 14.25, 15.75, 17.25, 18.75, 20.25, 21.75, 23.25)
        .zipWithIndex.map { case (l0, i) =>
          val d = l0.toInt; val m = math.round((l0 - d) * 60).toInt
          s"EPSG:${3007 + i}" -> tm(f"SWEREF99 $d%02d $m%02d", 0, l0, 1.0, 150000, 0,
            probe = (l0 + 0.3, 60.0))
        }.toMap ++
      // ETRS89 / Finland Gauss-Krüger zones GK19FIN..GK31FIN (lon0-prefixed FE)
      (19 to 31).map { l0 =>
        s"EPSG:${3854 + l0}" -> tm(s"ETRS89 / GK${l0}FIN", 0, l0, 1.0, l0 * 1e6 + 500000, 0,
          probe = (l0 + 0.3, 62.0))
      }.toMap

    // NAD83 / MTM (Canada 3° Modified Transverse Mercator, k=0.9999,
    // FE=304800): zone central meridians from the EPSG dataset
    val mtmLon0 = Vector(-53.0, -56.0, -58.5, -61.5, -64.5, -67.5, -70.5, -73.5,
      -76.5, -79.5, -82.5, -81.0, -84.0, -87.0, -90.0, -93.0, -96.0)
    val canadaMtm = (1 to 17).map { z =>
      s"EPSG:${32180 + z}" -> tm(s"NAD83 / MTM zone $z", 0, mtmLon0(z - 1), 0.9999,
        304800, 0, probe = (mtmLon0(z - 1) + 0.4, 46.5))
    }.toMap

    // ------------------------- EPSG batch 3 (round 10): ETRS89 national
    // LCC/conic + zoned TM grids — parameters from the public EPSG dataset
    val europe3 = Map(
      "EPSG:3416" -> lcc("ETRS89 / Austria Lambert", 49, 46, 47.5, dms(13, 20),
        400000, 400000, probe = (13.5, 47.6)),
      "EPSG:4839" -> lcc("ETRS89 / LCC Germany (N-E)", dms(48, 40), dms(53, 40), 51, 10.5,
        0, 0, probe = (10.5, 51.2))
    ) ++ (5 to 8).map { z =>
      // ETRS89 / Poland CS2000 zones 5-8 (tmerc k=0.999923, zone-prefixed FE)
      s"EPSG:${2171 + z}" -> tm(s"ETRS89 / Poland CS2000 zone $z", 0, 3 * z, 0.999923,
        z * 1e6 + 500000, 0, probe = (3.0 * z + 0.3, 52.0))
    }.toMap ++ (5 to 30).map { z =>
      // ETRS89 / NTM zones 5-30 (Norway 1° Transverse Mercator: lat0=58,
      // lon0 = zone + 0°30', k=1, FE=100000, FN=1000000)
      s"EPSG:${5100 + z}" -> tm(s"ETRS89 / NTM zone $z", 58, z + 0.5, 1.0,
        100000, 1000000, probe = (z + 0.5, 62.0))
    }.toMap

    // ------------------------- EPSG batch 4 (round 10): Tokyo-datum Japan
    // zones + JGD UTM, NAD83(CSRS) Canada blocks, Australian state Lamberts
    // on GDA94/GDA2020, Mexico INEGI Lambert, ESRI continental Albers.
    // Parameters from the public EPSG dataset / ESRI projection catalog.
    // Tokyo / Japan Plane Rectangular CS zones reuse the JGD zone origins
    // (EPSG keeps the conversion; only the datum changes)
    val tokyoJapan = jpOrigins.zipWithIndex.map { case ((lat0, lon0), i) =>
      s"EPSG:${30161 + i}" -> tm(s"Tokyo / Japan Plane Rectangular CS ${i + 1}",
        lat0, lon0, 0.9999, 0, 0, DatumTokyo, probe = (lon0 + 0.3, lat0 + 0.3))
    }.toMap
    val jgdUtm = (51 to 55).flatMap { z =>
      Seq(s"EPSG:${3097 + z - 51}" -> utmCrs(s"EPSG:${3097 + z - 51}", s"JGD2000 / UTM zone ${z}N", z, south = false, g),
        s"EPSG:${6688 + z - 51}" -> utmCrs(s"EPSG:${6688 + z - 51}", s"JGD2011 / UTM zone ${z}N", z, south = false, g))
    }.toMap
    // NAD83(CSRS) UTM: the published non-contiguous code blocks (CSRS ≈
    // NAD83 ≈ WGS84 at this chain's accuracy class, like the other modern
    // GRS80 realizations)
    val csrsUtm = Map(
      3154 -> 7, 3155 -> 8, 3156 -> 9, 3157 -> 10, 3158 -> 14, 3159 -> 15, 3160 -> 16,
      2955 -> 11, 2956 -> 12, 2957 -> 13, 2958 -> 17, 2959 -> 18, 2960 -> 19,
      2961 -> 20, 2962 -> 21
    ).map { case (code, z) =>
      s"EPSG:$code" -> utmCrs(s"EPSG:$code", s"NAD83(CSRS) / UTM zone ${z}N", z, south = false, g)
    }
    val canada4 = Map(
      "EPSG:32198" -> lcc("NAD83 / Quebec Lambert", 60, 46, 44, -68.5, 0, 0, probe = (-71.2, 46.8)),
      "EPSG:6622" -> lcc("NAD83(CSRS) / Quebec Lambert", 60, 46, 44, -68.5, 0, 0, probe = (-71.2, 46.8)),
      "EPSG:3005" -> alb("NAD83 / BC Albers", 50, 58.5, 45, -126, 1000000, 0, probe = (-123.1, 49.3)),
      "EPSG:3153" -> alb("NAD83(CSRS) / BC Albers", 50, 58.5, 45, -126, 1000000, 0, probe = (-123.1, 49.3)))
    val gda2020 = DatumGda2020
    val gdaLamberts = Map(
      "EPSG:3111" -> lcc("GDA94 / Vicgrid", -36, -38, -37, 145, 2500000, 2500000, probe = (144.96, -37.81)),
      "EPSG:7899" -> lcc("GDA2020 / Vicgrid", -36, -38, -37, 145, 2500000, 2500000, gda2020, probe = (144.96, -37.81)),
      "EPSG:3112" -> lcc("GDA94 / Geoscience Australia Lambert", -18, -36, 0, 134, 0, 0, probe = (134, -25)),
      "EPSG:7845" -> lcc("GDA2020 / GA LCC", -18, -36, 0, 134, 0, 0, gda2020, probe = (134, -25)),
      "EPSG:3308" -> lcc("GDA94 / NSW Lambert", -30.75, -35.75, -33.25, 147, 9300000, 4500000, probe = (151.2, -33.87)),
      "EPSG:8058" -> lcc("GDA2020 / NSW Lambert", -30.75, -35.75, -33.25, 147, 9300000, 4500000, gda2020, probe = (151.2, -33.87)),
      "EPSG:3107" -> lcc("GDA94 / SA Lambert", -28, -36, -32, 135, 1000000, 2000000, probe = (138.6, -34.93)),
      "EPSG:8059" -> lcc("GDA2020 / SA Lambert", -28, -36, -32, 135, 1000000, 2000000, gda2020, probe = (138.6, -34.93)))
    val mexico = Map(
      "EPSG:6362" -> lcc("Mexico ITRF92 / LCC", 17.5, 29.5, 12, -102, 2500000, 0, probe = (-99.1, 19.4)),
      "EPSG:6372" -> lcc("Mexico ITRF2008 / LCC", 17.5, 29.5, 12, -102, 2500000, 0, probe = (-99.1, 19.4)))
    val esriAlbers = Map(
      "ESRI:102003" -> alb("USA Contiguous Albers Equal Area Conic", 29.5, 45.5, 37.5, -96, 0, 0, probe = (-98, 38)),
      "ESRI:102008" -> alb("North America Albers Equal Area Conic", 20, 60, 40, -96, 0, 0, probe = (-98, 45)))
    val batch4 = tokyoJapan ++ jgdUtm ++ csrsUtm ++ canada4 ++ gdaLamberts ++ mexico ++ esriAlbers

    // ------------------------- EPSG batch 5 (round 10): Romania Stereo 70,
    // Pacific/NZ/Brazil Mercator aspects, PSAD56 UTM family, Central/South
    // America TM grids, ETRS89 zE-N + LCC(E-N) spellings.
    val stereo70 = {
      val proj = new Sterea(Krass1940, 46, 25, 0.99975, 500000, 500000)
      val p4 = s"+proj=sterea +lat_0=46 +lon_0=25 +k=0.99975 +x_0=500000 +y_0=500000 " +
        s"${datumTags(DatumDealul70)} +units=m +no_defs"
      Map(
        "EPSG:31700" -> Crs("Dealul Piscului 1970/ Stereo 70", proj, DatumDealul70, (26.1, 44.43), p4),
        "EPSG:3844" -> Crs("Pulkovo 1942(58) / Stereo70", proj, DatumDealul70, (26.1, 44.43), p4))
    }
    def mercTs(name: String, latTs: Double, lon0: Double, fe: Double, fn: Double,
               d: Datum, probe: (Double, Double)) = {
      // Mercator variant B: k0 = m(lat_ts) (Snyder 7-2), applied as a unit
      // view over the variant-A kernel — same construction as the +proj=
      // parse path, so the parity sweep is exact
      val ts = math.toRadians(latTs)
      val k0 = math.cos(ts) / math.sqrt(1 - d.el.e2 * math.sin(ts) * math.sin(ts))
      Crs(name, new InUnits(new MercatorEll(d.el, lon0, 0, 0), 1.0 / k0, fe, fn), d, probe,
        s"+proj=merc +lat_ts=${fmtP(latTs)} +lon_0=${fmtP(lon0)} +x_0=${fmtP(fe)} +y_0=${fmtP(fn)} " +
          s"${datumTags(d)} +units=m +no_defs")
    }
    val worldMerc = Map(
      "EPSG:3832" -> Crs("WGS 84 / PDC Mercator", new MercatorEll(Wgs84, 150, 0, 0), w, (160, 20),
        "+proj=merc +lon_0=150 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3994" -> mercTs("WGS 84 / Mercator 41", -41, 100, 0, 0, w, probe = (170, -41)),
      "EPSG:5641" -> mercTs("SIRGAS 2000 / Brazil Mercator", -2, -43, 5000000, 10000000, g, probe = (-40, -20)))
    // probes pinned inside actual PSAD56 coverage (Venezuela/Colombia ~5°N,
    // Peru ~8°S) — the default ±30° UTM probes land in open ocean AND push
    // the 2D height-drop Helmert round-trip drift past the 1 cm spec bound
    val psad56Utm = ((17 to 21).map { z =>
      s"EPSG:${24800 + z}" -> utmCrs(s"EPSG:${24800 + z}", s"PSAD56 / UTM zone ${z}N", z,
        south = false, DatumPsad56, probeLat = 5.0)
    } ++ (17 to 20).map { z =>
      s"EPSG:${24860 + z}" -> utmCrs(s"EPSG:${24860 + z}", s"PSAD56 / UTM zone ${z}S", z,
        south = true, DatumPsad56, probeLat = -8.0)
    }).toMap
    val latam = Map(
      "EPSG:3116" -> tm("MAGNA-SIRGAS / Colombia Bogota zone", dms(4, 35, 46.3215),
        dms(-74, 4, 39.0285), 1, 1000000, 1000000, probe = (-74.1, 4.6)),
      "EPSG:5367" -> tm("CR05 / CRTM05", 0, -84, 0.9999, 500000, 0, probe = (-84.1, 9.9)),
      "EPSG:5361" -> utmCrs("EPSG:5361", "SIRGAS-Chile 2002 / UTM zone 19S", 19, south = true, g),
      "EPSG:9155" -> utmCrs("EPSG:9155", "SIRGAS-Chile 2016 / UTM zone 19S", 19, south = true, g))
    val etrsExtra = Map(
      "EPSG:4647" -> tm("ETRS89 / UTM zone 32N (zE-N)", 0, 9, 0.9996, 32500000, 0, probe = (9.5, 51.0)),
      "EPSG:5243" -> lcc("ETRS89 / LCC Germany (E-N)", dms(48, 40), dms(53, 40), 51, 10.5,
        0, 0, probe = (10.5, 51.2)))
    val batch5 = stereo70 ++ worldMerc ++ psad56Utm ++ latam ++ etrsExtra

    // ------------------------- EPSG batch 6 (round 10): Nordic legacy grids,
    // Portugal Datum 73, US National Atlas sphere LAEA, Gulf singles.
    // KKJ zones 1-4: tmerc k=1 on International 1924, zone n at lon0=18+3n
    // with the zone-prefixed FE — zone 3 is the Finland Uniform grid (YKJ)
    val kkj = (1 to 4).map { z =>
      s"EPSG:${2390 + z}" -> tm(
        if (z == 3) "KKJ / Finland Uniform Coordinate System" else s"KKJ / Finland zone $z",
        0, 18 + 3 * z, 1, z * 1e6 + 500000, 0, DatumKkj, probe = (18 + 3 * z + 0.5, 62.0))
    }.toMap
    val nordic2 = Map(
      // Sweden's pre-SWEREF national grid: Bessel TM at 15°48'29.8"E
      "EPSG:3021" -> tm("RT90 2.5 gon V", 0, dms(15, 48, 29.8), 1, 1500000, 0,
        DatumRt90, probe = (15.8, 59.33)),
      "EPSG:5048" -> tm("ETRS89 / TM35FIN(N,E)", 0, 27, 0.9996, 500000, 0,
        probe = (24.94, 60.17)))
    val d73 = Map(
      // Modified Portuguese Grid: the published fractional false origin
      "EPSG:27493" -> tm("Datum 73 / Modified Portuguese Grid", dms(39, 40),
        dms(-8, 7, 54.862), 1, 180.598, -86.99, DatumD73, probe = (-8.5, 39.9)))
    // US National Atlas Equal Area: LAEA on the Clarke 1866 authalic SPHERE —
    // the ellipsoidal kernel's e→0 limit (qFn guard) makes it exact
    val atlasLaea = {
      val proj = new Laea(Sphere6370997, 45, -100, 0, 0)
      val p4 = "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +R=6370997 +units=m +no_defs"
      Map(
        "EPSG:9311" -> Crs("NAD27 / US National Atlas Equal Area", proj, DatumAtlasSphere, (-90, 40), p4),
        "EPSG:2163" -> Crs("US National Atlas Equal Area", proj, DatumAtlasSphere, (-90, 40), p4))
    }
    val gulf = ((36 to 38).map { z =>
      s"EPSG:${20400 + z}" -> utmCrs(s"EPSG:${20400 + z}", s"Ain el Abd / UTM zone ${z}N", z,
        south = false, DatumAinElAbd, probeLat = 24.0)
    }).toMap ++ Map(
      "EPSG:3997" -> tm("WGS 84 / Dubai Local TM", 0, dms(55, 20), 1, 500000, 0, w,
        probe = (55.3, 25.2)))
    val esriWorld = Map(
      "ESRI:54034" -> Crs("World_Cylindrical_Equal_Area", new Cea(Wgs84, 0, 0, 0, 0), w, (10, 30),
        "+proj=cea +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"))
    val batch6 = kkj ++ nordic2 ++ d73 ++ atlasLaea ++ gulf ++ esriWorld

    // ------------------------- EPSG batch 7 (round 11): SE/South Asia legacy
    // grids (VN-2000, Thailand, Malaysia/Singapore, Indonesia, Philippines,
    // India, Sri Lanka), Middle East (Oman, Qatar, UAE, Aramco), Africa
    // (Arc datums, Adindan, Egypt belts, Nigeria belts, Cape Lo, Maghreb),
    // and Italy Gauss-Boaga. Parameter values from the public EPSG dataset;
    // datum accuracy classes documented on the batch-7 Datum* vals.
    val seAsia = Map(
      "EPSG:3405" -> utmCrs("EPSG:3405", "VN-2000 / UTM zone 48N", 48, south = false, DatumVn2000, probeLat = 16.0),
      "EPSG:3406" -> utmCrs("EPSG:3406", "VN-2000 / UTM zone 49N", 49, south = false, DatumVn2000, probeLat = 12.5),
      // Kertau 1968 / Singapore Grid — Cassini-Soldner on Everest Modified
      "EPSG:24500" -> Crs("Kertau 1968 / Singapore Grid",
        new CassiniSoldner(Everest1948, dms(1, 17, 15.522), dms(103, 51, 7.925), 30000, 30000),
        DatumKertau, probe = (103.85, 1.3),
        s"+proj=cass +lat_0=${dms(1, 17, 15.522)} +lon_0=${dms(103, 51, 7.925)} " +
          s"+x_0=30000 +y_0=30000 ${datumTags(DatumKertau)} +units=m +no_defs")) ++
      (46 to 48).map { z =>
        s"EPSG:${23900 + z}" -> utmCrs(s"EPSG:${23900 + z}", s"Indian 1954 / UTM zone ${z}N", z,
          south = false, DatumIndian1954, probeLat = 18.0)
      } ++ (47 to 48).map { z =>
        s"EPSG:${24000 + z}" -> utmCrs(s"EPSG:${24000 + z}", s"Indian 1975 / UTM zone ${z}N", z,
          south = false, DatumIndian1975, probeLat = 15.0)
      } ++ (47 to 48).map { z =>
        s"EPSG:${24500 + z}" -> utmCrs(s"EPSG:${24500 + z}", s"Kertau 1968 / UTM zone ${z}N", z,
          south = false, DatumKertau, probeLat = 4.0)
      } ++ (46 to 52).map { z =>
        s"EPSG:${23820 + z}" -> utmCrs(s"EPSG:${23820 + z}", s"DGN95 / UTM zone ${z}N", z,
          south = false, DatumDgn95, probeLat = 2.0)
      } ++ (47 to 54).map { z =>
        s"EPSG:${23830 + z}" -> utmCrs(s"EPSG:${23830 + z}", s"DGN95 / UTM zone ${z}S", z,
          south = true, DatumDgn95, probeLat = -5.0)
      } ++ (48 to 50).map { z =>
        s"EPSG:${21100 + z}" -> utmCrs(s"EPSG:${21100 + z}", s"Batavia / UTM zone ${z}S", z,
          south = true, DatumBatavia, probeLat = -7.0)
      }
    // Indonesia TM-3 cadastral zones 46.2–54.1 (EPSG:23830-23845): tmerc
    // k=0.9999, FE=200000, FN=1500000, lon0 = 94.5 + 3·i — NOTE these codes
    // collide with nothing: the DGN95 UTM families above sit at 23866+/23877+.
    val tm3 = (0 to 15).map { i =>
      val lon0 = 94.5 + 3 * i
      val zone = s"${46 + (i + 1) / 2}.${if (i % 2 == 0) 2 else 1}"
      s"EPSG:${23830 + i}" -> tm(s"DGN95 / Indonesia TM-3 zone $zone", 0, lon0, 0.9999,
        200000, 1500000, DatumDgn95, probe = (lon0 + 0.5, -3.0))
    }.toMap
    // Philippines PRS92 PTM zones 1-5: tmerc k=0.99995 at odd meridians
    val prs92 = (1 to 5).map { z =>
      val lon0 = 115 + 2 * z
      s"EPSG:${3120 + z}" -> tm(s"PRS92 / Philippines zone $z", 0, lon0, 0.99995,
        500000, 0, DatumPrs92, probe = (lon0 + 0.3, 12.0))
    }.toMap
    // India: Kalianpur 1975 polyconic-era Lambert zones (EPSG 9801 1SP) +
    // the UTM block. Zone parameters are the 1975 metric adjustment.
    val india = Map(
      "EPSG:24378" -> lcc1("Kalianpur 1975 / India zone I", 32.5, 68, 0.99878641,
        2743195.5, 914398.5, DatumKalianpur75, probe = (71.0, 33.0)),
      "EPSG:24379" -> lcc1("Kalianpur 1975 / India zone IIa", 26, 74, 0.99878641,
        2743195.5, 914398.5, DatumKalianpur75, probe = (74.0, 25.0)),
      "EPSG:24380" -> lcc1("Kalianpur 1975 / India zone IIb", 26, 90, 0.99878641,
        2743195.5, 914398.5, DatumKalianpur75, probe = (88.0, 24.0)),
      "EPSG:24381" -> lcc1("Kalianpur 1975 / India zone III", 19, 80, 0.99878641,
        2743195.5, 914398.5, DatumKalianpur75, probe = (78.0, 18.0)),
      "EPSG:24382" -> lcc1("Kalianpur 1975 / India zone IV", 12, 80, 0.99878641,
        2743195.5, 914398.5, DatumKalianpur75, probe = (78.0, 12.0)),
      "EPSG:5234" -> tm("Kandawala / Sri Lanka Grid", dms(7, 0, 1.6975), dms(80, 46, 18.16),
        0.9999238418, 200000, 200000, DatumKandawala, probe = (80.6, 7.3))) ++
      (42 to 47).map { z =>
        s"EPSG:${24300 + z}" -> utmCrs(s"EPSG:${24300 + z}", s"Kalianpur 1975 / UTM zone ${z}N", z,
          south = false, DatumKalianpur75, probeLat = 20.0)
      }
    val midEast = Map(
      "EPSG:3439" -> utmCrs("EPSG:3439", "PSD93 / UTM zone 39N", 39, south = false, DatumPsd93, probeLat = 21.0),
      "EPSG:3440" -> utmCrs("EPSG:3440", "PSD93 / UTM zone 40N", 40, south = false, DatumPsd93, probeLat = 22.0),
      "EPSG:28600" -> tm("Qatar 1974 / Qatar National Grid", dms(24, 27), dms(51, 13),
        0.99999, 200000, 300000, DatumQatar74, probe = (51.5, 25.3)),
      "EPSG:2318" -> lcc("Ain el Abd / Aramco Lambert", 17, 33, 25.08951, 48, 0, 0,
        DatumAinElAbd, probe = (48.0, 25.0))) ++
      (38 to 40).map { z =>
        s"EPSG:${27000 + z}" -> utmCrs(s"EPSG:${27000 + z}", s"Nahrwan 1967 / UTM zone ${z}N", z,
          south = false, DatumNahrwan67, probeLat = 24.0)
      }
    val africa = Map(
      // Egypt 1907 survey belts (TM k=1 on Helmert 1906)
      "EPSG:22991" -> tm("Egypt 1907 / Blue Belt", 30, 35, 1, 300000, 1100000,
        DatumEgypt1907, probe = (34.0, 28.5)),
      "EPSG:22992" -> tm("Egypt 1907 / Red Belt", 30, 31, 1, 615000, 810000,
        DatumEgypt1907, probe = (31.2, 30.0)),
      "EPSG:22993" -> tm("Egypt 1907 / Purple Belt", 30, 27, 1, 700000, 200000,
        DatumEgypt1907, probe = (27.5, 29.5)),
      "EPSG:22994" -> tm("Egypt 1907 / Extended Purple Belt", 30, 27, 1, 700000, 1200000,
        DatumEgypt1907, probe = (27.5, 23.0)),
      // Nigeria Minna belts (TM k=0.99975, legislated false eastings)
      "EPSG:26391" -> tm("Minna / Nigeria West Belt", 4, 4.5, 0.99975, 230738.26, 0,
        DatumMinna, probe = (5.0, 7.0)),
      "EPSG:26392" -> tm("Minna / Nigeria Mid Belt", 4, 8.5, 0.99975, 670553.98, 0,
        DatumMinna, probe = (8.7, 9.1)),
      "EPSG:26393" -> tm("Minna / Nigeria East Belt", 4, 12.5, 0.99975, 1110369.7, 0,
        DatumMinna, probe = (13.0, 10.0)),
      // Tunisia: Carthage LCC 1SP belts (+ UTM 32N below)
      "EPSG:22391" -> lcc1("Carthage / Nord Tunisie", 36, 9.9, 0.999625544,
        500000, 300000, DatumCarthage, probe = (10.0, 36.5)),
      "EPSG:22392" -> lcc1("Carthage / Sud Tunisie", 33.3, 9.9, 0.999625769,
        500000, 300000, DatumCarthage, probe = (9.5, 33.8)),
      "EPSG:22332" -> utmCrs("EPSG:22332", "Carthage / UTM zone 32N", 32, south = false,
        DatumCarthage, probeLat = 35.0),
      // Morocco: Merchich LCC 1SP belts
      "EPSG:26191" -> lcc1("Merchich / Nord Maroc", 33.3, -5.4, 0.999625769,
        500000, 300000, DatumMerchich, probe = (-6.5, 33.8)),
      "EPSG:26192" -> lcc1("Merchich / Sud Maroc", 29.7, -5.4, 0.999615596,
        500000, 300000, DatumMerchich, probe = (-7.5, 30.2)),
      "EPSG:26193" -> lcc1("Merchich / Sahara", 26.1, -5.4, 0.999616304,
        1200000, 400000, DatumMerchich, probe = (-9.5, 26.5))) ++
      (34 to 36).map { z =>
        s"EPSG:${20900 + z}" -> utmCrs(s"EPSG:${20900 + z}", s"Arc 1950 / UTM zone ${z}S", z,
          south = true, DatumArc1950, probeLat = -15.0)
      } ++ (35 to 37).map { z =>
        s"EPSG:${21000 + z}" -> utmCrs(s"EPSG:${21000 + z}", s"Arc 1960 / UTM zone ${z}S", z,
          south = true, DatumArc1960, probeLat = -5.0)
      } ++ (35 to 37).map { z =>
        s"EPSG:${21060 + z}" -> utmCrs(s"EPSG:${21060 + z}", s"Arc 1960 / UTM zone ${z}N", z,
          south = false, DatumArc1960, probeLat = 1.5)
      } ++ (35 to 38).map { z =>
        s"EPSG:${20100 + z}" -> utmCrs(s"EPSG:${20100 + z}", s"Adindan / UTM zone ${z}N", z,
          south = false, DatumAdindan, probeLat = 15.0)
      } ++ (31 to 32).map { z =>
        s"EPSG:${26300 + z}" -> utmCrs(s"EPSG:${26300 + z}", s"Minna / UTM zone ${z}N", z,
          south = false, DatumMinna, probeLat = 8.0)
      } ++ (29 to 32).map { z =>
        s"EPSG:${30700 + z}" -> utmCrs(s"EPSG:${30700 + z}", s"Nord Sahara 1959 / UTM zone ${z}N", z,
          south = false, DatumNordSahara, probeLat = 28.0)
      }
    // Cape / Lo survey grid (odd meridians 15..33, EPSG:22275+2i) —
    // south-oriented TM k=1 like the Hartebeesthoek Lo successors
    val capeLo = (0 to 9).map { i =>
      val lon0 = 15 + 2 * i
      s"EPSG:${22275 + 2 * i}" -> Crs(s"Cape / Lo$lon0",
        new SouthOriented(new TransMerc(Clarke1880Arc, 0, lon0, 1.0, 0, 0)),
        DatumCape, probe = (lon0 + 0.4, -30.0),
        s"+proj=tmerc +lat_0=0 +lon_0=$lon0 +k=1 +x_0=0 +y_0=0 +axis=wsu " +
          s"${datumTags(DatumCape)} +units=m +no_defs")
    }.toMap
    val italy = Map(
      "EPSG:3003" -> tm("Monte Mario / Italy zone 1", 0, 9, 0.9996, 1500000, 0,
        DatumMonteMario, probe = (9.2, 45.4)),
      "EPSG:3004" -> tm("Monte Mario / Italy zone 2", 0, 15, 0.9996, 2520000, 0,
        DatumMonteMario, probe = (15.2, 41.9)))
    val batch7 = seAsia ++ tm3 ++ prs92 ++ india ++ midEast ++ africa ++ capeLo ++ italy

    // ------------------------- EPSG batch 8 (round 11): Antarctic science
    // grids, Conus Albers realizations, SAD69/ID74/Bogota legacy zones,
    // NTF Corse, ED50 offshore TM, Palestine grids. Parameters from the
    // public EPSG dataset; datum accuracy classes on the batch-8 Datum*.
    val batch8 = Map(
      // WGS 84 Antarctic pair (AAD standard grids)
      "EPSG:3032" -> Crs("WGS 84 / Australian Antarctic Polar Stereographic",
        new PolarStereo(Wgs84, -71, 70, 6000000, 6000000, north = false), w, (70, -68),
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 +x_0=6000000 +y_0=6000000 +ellps=WGS84 +units=m +no_defs"),
      "EPSG:3033" -> lcc("WGS 84 / Australian Antarctic Lambert", -68.5, -74.5, -50, 70,
        6000000, 6000000, w, probe = (70, -68)),
      // Conus Albers on the later NAD83 realizations (EPSG reuses the
      // conversion verbatim; realizations agree at this chain's class)
      "EPSG:5071" -> alb("NAD83(HARN) / Conus Albers", 29.5, 45.5, 23, -96, 0, 0, probe = (-96, 38)),
      "EPSG:5072" -> alb("NAD83(NSRS2007) / Conus Albers", 29.5, 45.5, 23, -96, 0, 0, probe = (-96, 38)),
      // ... and the NAD27 ancestor (CONUS-mean Helmert, same NADCON note
      // as the NAD27 UTM family) + the USGS ESRI spelling
      "EPSG:5069" -> alb("NAD27 / Conus Albers", 29.5, 45.5, 23, -96, 0, 0,
        DatumNad27, probe = (-96, 38)),
      "ESRI:102039" -> alb("USA Contiguous Albers Equal Area Conic USGS version",
        29.5, 45.5, 23, -96, 0, 0, probe = (-96, 38)),
      // the deprecated spelling of the 29902 grid (legacy Irish data)
      "EPSG:29900" -> tm("TM65 / Irish National Grid", 53.5, -8, 1.000035, 200000, 250000,
        DatumTm75, probe = (-6.26, 53.35)),
      // eqc on the GRS80 authalic sphere (4087's sphere sibling)
      "EPSG:4088" -> Crs("World Equidistant Cylindrical (Sphere)",
        new EquidistantCyl(SphereGrs80Authalic, 0, 0, 0, 0), DatumGrs80Sphere, (10, 55),
        "+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +R=6371007 +units=m +no_defs"),
      // NTF (Paris) Lambert Corse: the fourth conic the 27561-63 family left
      // out, plus its carto (zone IV) false-northing spelling
      "EPSG:27564" -> lcc1("NTF (Paris) / Lambert Corse", 42.165, parisLon, 0.99994471,
        234.358, 185861.369, DatumNtf, probe = (9.1, 42.2)),
      "EPSG:27574" -> lcc1("NTF (Paris) / Lambert zone IV", 42.165, parisLon, 0.99994471,
        234.358, 4185861.369, DatumNtf, probe = (9.1, 42.2)),
      // ED50 offshore TM belts (North Sea exploration grids)
      "EPSG:23090" -> tm("ED50 / TM 0 N", 0, 0, 0.9996, 500000, 0, DatumEd50, probe = (1.5, 57)),
      "EPSG:23095" -> tm("ED50 / TM 5 NE", 0, 5, 0.9996, 500000, 0, DatumEd50, probe = (6.0, 55)),
      // EST92: the same national Lambert conversion as 3301 on the earlier
      // ETRS89-aligned realization (grid-identical at this chain's class)
      "EPSG:3300" -> lcc("Estonian Coordinate System of 1992", dms(59, 20), 58,
        dms(57, 31, 3.19415), 24, 500000, 6375000, probe = (24.75, 59.43)),
      // Palestine 1923: the Cassini-Soldner survey grid and its TM belt twin
      "EPSG:28191" -> Crs("Palestine 1923 / Palestine Grid",
        new CassiniSoldner(Clarke1880Benoit, dms(31, 44, 2.749), dms(35, 12, 43.49),
          170251.555, 126867.909), DatumPalestine, (35.2, 31.8),
        s"+proj=cass +lat_0=${fmtP(dms(31, 44, 2.749))} +lon_0=${fmtP(dms(35, 12, 43.49))} " +
          s"+x_0=170251.555 +y_0=126867.909 ${datumTags(DatumPalestine)} +units=m +no_defs"),
      "EPSG:28192" -> tm("Palestine 1923 / Palestine Belt", dms(31, 44, 2.749),
        dms(35, 12, 43.49), 1.0, 170251.555, 1126867.909, DatumPalestine, probe = (35.2, 31.8)),
      // Borneo UTM on the Timbalai datum already registered for RSO
      "EPSG:29849" -> utmCrs("EPSG:29849", "Timbalai 1948 / UTM zone 49N", 49,
        south = false, DatumTimbalai, probeLat = 4.0),
      "EPSG:29850" -> utmCrs("EPSG:29850", "Timbalai 1948 / UTM zone 50N", 50,
        south = false, DatumTimbalai, probeLat = 4.0),
      // Iceland's current national Lambert (ISN93's ITRF2004 successor —
      // same kernel family as 3057, different parallels/offsets)
      "EPSG:5325" -> lcc("ISN2004 / Lambert 2004", 64.25, 65.75, 65, -19,
        1700000, 300000, probe = (-19, 65)),
      // the ESRI spelling of ellipsoidal world Mercator (= EPSG:3395 grid)
      "ESRI:54004" -> Crs("World Mercator", new MercatorEll(Wgs84, 0, 0, 0), w, (10, 50),
        "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs")
    ) ++ (0 to 3).map { i =>
      // Bogota 1975 TM zones: 3-degree belts off the Bogota origin meridian
      val names = Seq("Colombia West zone", "Colombia Bogota zone", "Colombia East Central zone", "Colombia East zone")
      val lon0 = dms(-74, 4, 51.3) + 3.0 * (i - 1)
      s"EPSG:${21896 + i}" -> tm(s"Bogota 1975 / ${names(i)}", dms(4, 35, 56.57), lon0,
        1.0, 1000000, 1000000, DatumBogota, probe = (lon0 + 0.3, 5.0))
    }.toMap ++ (18 to 22).map { z =>
      s"EPSG:${29150 + z}" -> utmCrs(s"EPSG:${29150 + z}", s"SAD69 / UTM zone ${z}N", z,
        south = false, DatumSad69, probeLat = 3.0)
    } ++ (17 to 25).map { z =>
      s"EPSG:${29170 + z}" -> utmCrs(s"EPSG:${29170 + z}", s"SAD69 / UTM zone ${z}S", z,
        south = true, DatumSad69, probeLat = -10.0)
    } ++ (46 to 53).map { z =>
      s"EPSG:${23800 + z}" -> utmCrs(s"EPSG:${23800 + z}", s"ID74 / UTM zone ${z}N", z,
        south = false, DatumId74, probeLat = 2.0)
    }

    // ------------------------- EPSG batch 9 (round 12): ESRI continental
    // conics, Algerian Lamberts, NAD83(CSRS) SCoPQ/MTM zones, the original
    // EASE grid. Parameters from the public EPSG/ESRI datasets; China GK
    // families are pattern-matched in lookup (BeijingGk*/XianGk).
    val batch9 = Map(
      // ESRI continental conic family (NAD83 frame, meters)
      "ESRI:102001" -> alb("Canada Albers Equal Area Conic", 50, 70, 40, -96, 0, 0,
        probe = (-96, 55)),
      "ESRI:102002" -> lcc("Canada Lambert Conformal Conic", 50, 70, 40, -96, 0, 0,
        probe = (-96, 55)),
      "ESRI:102004" -> lcc("USA Contiguous Lambert Conformal Conic", 33, 45, 39, -96, 0, 0,
        probe = (-96, 38)),
      "ESRI:102009" -> lcc("North America Lambert Conformal Conic", 20, 60, 40, -96, 0, 0,
        probe = (-96, 45)),
      // Nord Sahara 1959 Lamberts (Voirol Unifié grids; 1SP with scale)
      "EPSG:30791" -> lcc1("Nord Sahara 1959 / Nord Algerie", 36, 2.7, 0.999625769,
        500135, 300090, DatumNordSahara, probe = (3.0, 36.4)),
      "EPSG:30792" -> lcc1("Nord Sahara 1959 / Sud Algerie", 33.3, 2.7, 0.999625769,
        500135, 300090, DatumNordSahara, probe = (3.0, 33.6)),
      // the original EASE grid on the International 1924 authalic sphere
      // (EASE-Grid 2.0 / EPSG:6933 is already registered on WGS84)
      "EPSG:3410" -> Crs("NSIDC EASE-Grid Global",
        new Cea(SphereIntl1924Authalic, 30, 0, 0, 0), DatumIntl1924Sphere, (10, 40),
        "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +R=6371228 +units=m +no_defs"),
      // NAD83(CSRS98) / SCoPQ zone 2 (Québec; MTM parameters, its own CM)
      "EPSG:2944" -> tm("NAD83(CSRS98) / SCoPQ zone 2", 0, -55.5, 0.9999, 304800, 0,
        probe = (-55.1, 47.2)),
      // ESRI continental conic completions (WGS 84 frame, meters) — the
      // remaining high-traffic members of the 102xxx family
      "ESRI:102012" -> lcc("Asia Lambert Conformal Conic", 30, 62, 0, 105, 0, 0, w,
        probe = (105, 40)),
      "ESRI:102013" -> alb("Europe Albers Equal Area Conic", 43, 62, 30, 10, 0, 0, w,
        probe = (10, 50)),
      "ESRI:102014" -> lcc("Europe Lambert Conformal Conic", 43, 62, 30, 10, 0, 0, w,
        probe = (10, 50)),
      "ESRI:102024" -> lcc("Africa Lambert Conformal Conic", 20, -23, 0, 25, 0, 0, w,
        probe = (25, 5)),
      "ESRI:102027" -> lcc("Asia North Lambert Conformal Conic", 15, 65, 30, 95, 0, 0, w,
        probe = (95, 50)),
      "ESRI:102030" -> lcc("Asia South Lambert Conformal Conic", 7, -32, -15, 125, 0, 0, w,
        probe = (125, -10))
    ) ++ (3 to 10).map { z =>
      // NAD83(CSRS98) / MTM zones 3-10 — the CSRS realization of the 32183+
      // family (EPSG reuses the zone conversions; frames agree at this
      // chain's class)
      s"EPSG:${2942 + z}" -> tm(s"NAD83(CSRS98) / MTM zone $z", 0, mtmLon0(z - 1), 0.9999,
        304800, 0, probe = (mtmLon0(z - 1) + 0.4, 46.5))
    }

    // ------------------------- EPSG batch 11 (round 13): the South American
    // gaps around the already-registered POSGAR/SIRGAS-2000/PSAD56/SAD69
    // families. Parameters from the public EPSG dataset; every kernel below
    // (tm/utm) is already registry-sweep-validated.
    val batch11 = Map(
      // MAGNA-SIRGAS Colombia zones besides the registered Bogota zone
      // (3116): same origin latitude/FE/FN, CM at Bogota ±3°/±6°
      "EPSG:3114" -> tm("MAGNA-SIRGAS / Colombia Far West zone", dms(4, 35, 46.3215),
        dms(-80, 4, 39.0285), 1, 1000000, 1000000, probe = (-80.0, 4.7)),
      "EPSG:3115" -> tm("MAGNA-SIRGAS / Colombia West zone", dms(4, 35, 46.3215),
        dms(-77, 4, 39.0285), 1, 1000000, 1000000, probe = (-77.0, 4.7)),
      "EPSG:3117" -> tm("MAGNA-SIRGAS / Colombia East Central zone", dms(4, 35, 46.3215),
        dms(-71, 4, 39.0285), 1, 1000000, 1000000, probe = (-71.0, 4.7)),
      "EPSG:3118" -> tm("MAGNA-SIRGAS / Colombia East zone", dms(4, 35, 46.3215),
        dms(-68, 4, 39.0285), 1, 1000000, 1000000, probe = (-68.0, 4.7)),
      // Venezuela REGVEN (SIRGAS-aligned, GRS80 null transform)
      "EPSG:2201" -> utmCrs("EPSG:2201", "REGVEN / UTM zone 18N", 18, south = false, g, probeLat = 8.5),
      "EPSG:2202" -> utmCrs("EPSG:2202", "REGVEN / UTM zone 19N", 19, south = false, g, probeLat = 8.5),
      "EPSG:2203" -> utmCrs("EPSG:2203", "REGVEN / UTM zone 20N", 20, south = false, g, probeLat = 8.5),
      // Peru96 (SIRGAS-aligned)
      "EPSG:5387" -> utmCrs("EPSG:5387", "Peru96 / UTM zone 18S", 18, south = true, g, probeLat = -10.0),
      "EPSG:5389" -> utmCrs("EPSG:5389", "Peru96 / UTM zone 19S", 19, south = true, g, probeLat = -13.0),
      // Uruguay SIRGAS-ROU98 (SIRGAS-aligned)
      "EPSG:5382" -> utmCrs("EPSG:5382", "SIRGAS-ROU98 / UTM zone 21S", 21, south = true, g, probeLat = -33.0),
      "EPSG:5383" -> utmCrs("EPSG:5383", "SIRGAS-ROU98 / UTM zone 22S", 22, south = true, g, probeLat = -33.5)
    ) ++ (1 to 7).map { faja =>
      // Campo Inchauspe / Argentina fajas 1-7 (the pre-POSGAR grids): the
      // POSGAR GK layout (lat_0=-90, k=1, FE=faja*1e6+500000) on
      // International 1924 with the published mean shift
      s"EPSG:${22190 + faja}" -> tm(s"Campo Inchauspe / Argentina $faja", -90,
        3.0 * faja - 75.0, 1, faja * 1e6 + 500000, 0, DatumCampo,
        probe = (3.0 * faja - 75.0 + 0.5, -35.0))
    } ++ (17 to 21).map { z =>
      // SIRGAS 1995 / UTM (the pre-2000 SIRGAS realization; GRS80,
      // WGS84-aligned at this chain's class like SIRGAS 2000)
      s"EPSG:${31969 + z}" -> utmCrs(s"EPSG:${31969 + z}", s"SIRGAS 1995 / UTM zone ${z}N", z,
        south = false, g, probeLat = 5.0)
    } ++ (17 to 22).map { z =>
      s"EPSG:${31975 + z}" -> utmCrs(s"EPSG:${31975 + z}", s"SIRGAS 1995 / UTM zone ${z}S", z,
        south = true, g, probeLat = -12.0)
    }

    // ------------------------- EPSG batch 12 (round 14): Levant/Madagascar/
    // West Africa residue, the British West Indies Grid family, Jamaica,
    // PNG94, Fiji Map Grid. Parameters from the public EPSG dataset; every
    // kernel (tm/utm/lcc1/cass) is already registry-sweep-validated.
    val batch12 = Map(
      // Ain el Abd zone 39N (36-38N registered in batch 6) + the Bahrain
      // national grid (the UTM 39N conversion under its own code)
      "EPSG:20439" -> utmCrs("EPSG:20439", "Ain el Abd / UTM zone 39N", 39,
        south = false, DatumAinElAbd, probeLat = 25.0),
      "EPSG:20499" -> utmCrs("EPSG:20499", "Ain el Abd / Bahrain Grid", 39,
        south = false, DatumAinElAbd, probeLat = 26.1),
      // Syria: the Levant Lambert zone (lcc 1SP)
      "EPSG:22770" -> lcc1("Deir ez Zor / Syria Lambert", dms(34, 39), dms(37, 21),
        0.9996256, 300000, 300000, DatumDeirEzZor, probe = (36.3, 33.5)),
      // Israeli CS Grid: the Palestine 1923 Cassini survey origin with the
      // +1,000,000 false-northing offset (28191's CS twin)
      "EPSG:28193" -> Crs("Palestine 1923 / Israeli CS Grid",
        new CassiniSoldner(Clarke1880Benoit, dms(31, 44, 2.749), dms(35, 12, 43.49),
          170251.555, 1126867.909), DatumPalestine, (35.2, 31.8),
        s"+proj=cass +lat_0=${fmtP(dms(31, 44, 2.749))} +lon_0=${fmtP(dms(35, 12, 43.49))} " +
          s"+x_0=170251.555 +y_0=1126867.909 ${datumTags(DatumPalestine)} +units=m +no_defs"),
      // Madagascar: Tananarive UTM belt pair
      "EPSG:29738" -> utmCrs("EPSG:29738", "Tananarive / UTM zone 38S", 38,
        south = true, DatumTananarive, probeLat = -19.0),
      "EPSG:29739" -> utmCrs("EPSG:29739", "Tananarive / UTM zone 39S", 39,
        south = true, DatumTananarive, probeLat = -16.0),
      // Ghana Metre Grid (TM, legislated metric false easting)
      "EPSG:25000" -> tm("Leigon / Ghana Metre Grid", dms(4, 40), -1, 0.99975,
        274319.51, 0, DatumLeigon, probe = (-0.2, 5.6)),
      // Côte d'Ivoire UTM pairs: the IGN 1965 triangulation and its 1987
      // readjustment (EPSG interleaves the codes by zone)
      "EPSG:2040" -> utmCrs("EPSG:2040", "Locodjo 1965 / UTM zone 30N", 30,
        south = false, DatumLocodjo, probeLat = 6.0),
      "EPSG:2041" -> utmCrs("EPSG:2041", "Abidjan 1987 / UTM zone 30N", 30,
        south = false, DatumAbidjan, probeLat = 6.0),
      "EPSG:2042" -> utmCrs("EPSG:2042", "Locodjo 1965 / UTM zone 29N", 29,
        south = false, DatumLocodjo, probeLat = 6.5),
      "EPSG:2043" -> utmCrs("EPSG:2043", "Abidjan 1987 / UTM zone 29N", 29,
        south = false, DatumAbidjan, probeLat = 6.5),
      // Jamaica: the 1969 national Lambert and its metric JAD2001 successor
      "EPSG:24200" -> lcc1("JAD69 / Jamaica National Grid", 18, -77, 1.0,
        250000, 150000, DatumJad69, probe = (-76.8, 18.0)),
      "EPSG:3448" -> lcc1("JAD2001 / Jamaica Metric Grid", 18, -77, 1.0,
        750000, 650000, w, probe = (-76.8, 18.0)),
      // Fiji Map Grid (TM on the WGS 72 ellipsoid, 2M/4M false origin)
      "EPSG:3460" -> tm("Fiji 1986 / Fiji Map Grid", -17, 178.75, 0.99985,
        2000000, 4000000, DatumFiji86, probe = (178.0, -17.8))
    ) ++ (1 to 7).map { i =>
      // British West Indies Grid: one shared TM conversion (lat_0=0,
      // lon_0=-62, k=0.9995, FE=400000) under seven island datums
      val islands = Seq(
        ("Antigua 1943", DatumAntigua43, (-61.8, 17.1)),
        ("Dominica 1945", DatumDominica45, (-61.35, 15.4)),
        ("Grenada 1953", DatumGrenada53, (-61.67, 12.1)),
        ("Montserrat 1958", DatumMontserrat58, (-62.2, 16.75)),
        ("St. Kitts 1955", DatumStKitts55, (-62.7, 17.3)),
        ("St. Lucia 1955", DatumStLucia55, (-61.0, 13.9)),
        ("St. Vincent 45", DatumStVincent45, (-61.2, 13.25)))
      val (nm, d, probe) = islands(i - 1)
      s"EPSG:${2000 + i}" -> tm(s"$nm / British West Indies Grid", 0, -62, 0.9995,
        400000, 0, d, probe = probe)
    } ++ (54 to 56).map { z =>
      // PNG94 / PNGMG94 zones (GRS80, WGS84-aligned like the SIRGAS class)
      s"EPSG:${5496 + z}" -> utmCrs(s"EPSG:${5496 + z}", s"PNG94 / PNGMG94 zone $z", z,
        south = true, g, probeLat = -6.0)
    }

    // ------------------------- EPSG batch 13 (round 15): the Pacific modern
    // frames (NZGD2000 UTM, RGPF, RGNC91-93), NZGD49 UTM, NE/Equatorial
    // Africa residue (Massawa, Pointe Noire, M'poraloko), Barbados, the
    // Ocotepeque 1935 Central-America Lamberts, Bermuda. Parameters from the
    // public EPSG dataset; every kernel (tm/utm/lcc1/lcc2SP) is already
    // registry-sweep-validated.
    val batch13 = Map(
      // New Caledonia: RGNC91-93 national Lambert (GRS80, null transform)
      "EPSG:3163" -> lcc("RGNC91-93 / Lambert New Caledonia", dms(-20, 40), dms(-22, 20),
        dms(-21, 30), 166, 400000, 300000, g, probe = (166.5, -22.0)),
      // NE Africa: Massawa (Eritrea)
      "EPSG:26237" -> utmCrs("EPSG:26237", "Massawa / UTM zone 37N", 37,
        south = false, DatumMassawa, probeLat = 15.5),
      // Equatorial Africa: Congo and Gabon UTM
      "EPSG:28232" -> utmCrs("EPSG:28232", "Pointe Noire / UTM zone 32S", 32,
        south = true, DatumPointeNoire, probeLat = -4.5),
      "EPSG:26632" -> utmCrs("EPSG:26632", "M'poraloko / UTM zone 32N", 32,
        south = false, DatumMporaloko, probeLat = 0.8),
      "EPSG:26692" -> utmCrs("EPSG:26692", "M'poraloko / UTM zone 32S", 32,
        south = true, DatumMporaloko, probeLat = -1.5),
      // Barbados: the shared BWI TM conversion + the national grid
      "EPSG:21291" -> tm("Barbados 1938 / British West Indies Grid", 0, -62, 0.9995,
        400000, 0, DatumBarbados38, probe = (-59.55, 13.2)),
      "EPSG:21292" -> tm("Barbados 1938 / Barbados National Grid", dms(13, 10, 35),
        dms(-59, 33, 35), 0.9999986, 30000, 75000, DatumBarbados38, probe = (-59.55, 13.2)),
      // Central America: the Ocotepeque 1935 national Lamberts (lcc 1SP)
      "EPSG:5456" -> lcc1("Ocotepeque 1935 / Costa Rica Norte", dms(10, 28), dms(-84, 20),
        0.99995696, 500000, 271820.522, DatumOcotepeque, probe = (-84.2, 10.2)),
      "EPSG:5457" -> lcc1("Ocotepeque 1935 / Costa Rica Sur", 9, dms(-83, 40),
        0.99995696, 500000, 327987.436, DatumOcotepeque, probe = (-83.5, 8.8)),
      "EPSG:5459" -> lcc1("Ocotepeque 1935 / Guatemala Sur", dms(14, 54), dms(-90, 20),
        0.99989906, 500000, 292209.579, DatumOcotepeque, probe = (-90.5, 14.5)),
      "EPSG:5460" -> lcc1("Ocotepeque 1935 / El Salvador Lambert", dms(13, 47), -89,
        0.99996704, 500000, 295809.184, DatumOcotepeque, probe = (-89.2, 13.7)),
      "EPSG:5461" -> lcc1("Ocotepeque 1935 / Nicaragua Norte", dms(13, 52), dms(-85, 30),
        0.99990314, 500000, 359891.816, DatumOcotepeque, probe = (-85.7, 13.9)),
      "EPSG:5462" -> lcc1("Ocotepeque 1935 / Nicaragua Sur", dms(11, 44), dms(-85, 30),
        0.99992228, 500000, 288876.327, DatumOcotepeque, probe = (-85.6, 11.9)),
      // Bermuda 1957 (Clarke 1866 island survey)
      "EPSG:3769" -> utmCrs("EPSG:3769", "Bermuda 1957 / UTM zone 20N", 20,
        south = false, DatumBermuda57, probeLat = 32.3)
    ) ++ (58 to 60).map { z =>
      // NZGD2000 / UTM (GRS80, null transform; NZTM 2193 already registered)
      s"EPSG:${2075 + z}" -> utmCrs(s"EPSG:${2075 + z}", s"NZGD2000 / UTM zone ${z}S", z,
        south = true, g, probeLat = -41.0)
    } ++ (58 to 60).map { z =>
      // NZGD49 / UTM (the pre-2000 frame; LINZ 7-parameter)
      s"EPSG:${27200 + z}" -> utmCrs(s"EPSG:${27200 + z}", s"NZGD49 / UTM zone ${z}S", z,
        south = true, DatumNzgd49, probeLat = -41.0)
    } ++ (5 to 8).map { z =>
      // French Polynesia: RGPF / UTM 5S-8S (GRS80, null transform)
      s"EPSG:${3291 + z}" -> utmCrs(s"EPSG:${3291 + z}", s"RGPF / UTM zone ${z}S", z,
        south = true, g, probeLat = -17.5)
    } ++ (57 to 59).map { z =>
      // New Caledonia: RGNC91-93 / UTM (GRS80, null transform)
      s"EPSG:${3112 + z}" -> utmCrs(s"EPSG:${3112 + z}", s"RGNC91-93 / UTM zone ${z}S", z,
        south = true, g, probeLat = -21.5)
    }

    // ------------------------- EPSG batch 14 (round 16): systematic bulk
    // expansion of the FORMULAIC zone-family blocks. This zero-egress
    // environment ships no machine-readable EPSG dataset to import (no
    // proj.db, no pyproj, no DuckDB spatial extension — the oracle is plain
    // SQL), so a one-shot whole-catalog import is not possible; what IS
    // possible without a dataset is the code blocks whose code→parameter
    // mapping is pure published arithmetic. Two families: (1) the Pulkovo
    // 1942 Gauss-Krüger CM/3-degree blocks — 146 codes, the largest
    // formulaic block the registry was missing (6° CM 2492-2522, 3° zones
    // 7-64 at 2523-2580, 3° CM 2581-2637; lon_0 and FE derive from the
    // zone/CM number exactly like the validated 6° family at 28402-28432) —
    // and (2) the legacy national UTM blocks of datums ALREADY validated by
    // the datum round-trip sweep (code = published base + zone). Every entry
    // lands in the proj4 re-parse parity sweep like any hand-written row.
    val pulkovo42Bulk = {
      def cmName(cmRaw: Int) = {
        val cm = if (cmRaw > 180) cmRaw - 360 else cmRaw
        if (cm < 0) s"${-cm}W" else s"${cm}E"
      }
      def gk(code: Int, name: String, lon0Raw: Int, fe: Double) = {
        val lon0 = if (lon0Raw > 180) lon0Raw - 360.0 else lon0Raw.toDouble
        // lon0 = 180 (3° zone 60): probe west of the CM so the probe stays a
        // valid longitude (180.5 would wrap to -179.5 and fail the sweep)
        val probeLon = if (lon0 >= 179.5) lon0 - 0.5 else lon0 + 0.5
        s"EPSG:$code" -> Crs(s"Pulkovo 1942 / $name",
          new TransMerc(Krass1940, 0, lon0, 1.0, fe, 0), DatumPulkovo42,
          (probeLon, 55.0),
          s"+proj=tmerc +lat_0=0 +lon_0=${fmtP(lon0)} +k=1 +x_0=${fmtP(fe)} " +
            "+y_0=0 +ellps=krass +towgs84=28,-130,-95 +units=m +no_defs")
      }
      val cm6 = (0 to 30).map(i =>
        gk(2492 + i, s"Gauss-Kruger CM ${cmName(9 + 6 * i)}", 9 + 6 * i, 500000))
      val z3 = (7 to 64).map(z =>
        gk(2523 + (z - 7), s"3-degree Gauss-Kruger zone $z", 3 * z, z * 1e6 + 500000))
      val cm3 = (0 to 56).map(i =>
        gk(2581 + i, s"3-degree Gauss-Kruger CM ${cmName(21 + 3 * i)}", 21 + 3 * i, 500000))
      (cm6 ++ z3 ++ cm3).toMap
    }
    val legacyUtm = {
      def block(nm: String, d: Datum, codeBase: Int, zones: Range,
                south: Boolean, probeLat: Double) =
        zones.map { z =>
          val code = s"EPSG:${codeBase + z}"
          code -> utmCrs(code, s"$nm / UTM zone $z${if (south) "S" else "N"}",
            z, south, d, probeLat)
        }
      (block("Adindan", DatumAdindan, 20100, 35 to 38, south = false, 15.0) ++
        block("Ain el Abd", DatumAinElAbd, 20400, 36 to 40, south = false, 24.0) ++
        block("Arc 1950", DatumArc1950, 20900, 34 to 36, south = true, -18.0) ++
        block("Arc 1960", DatumArc1960, 21000, 35 to 37, south = true, -3.5) ++
        block("Arc 1960", DatumArc1960, 21060, 35 to 37, south = false, 1.5) ++
        block("Batavia", DatumBatavia, 21100, 48 to 50, south = true, -7.0) ++
        block("Corrego Alegre 1970-72", DatumCorrego, 22500, 21 to 25, south = true, -20.0) ++
        block("Indian 1954", DatumIndian1954, 23900, 46 to 48, south = false, 18.0) ++
        block("Indian 1975", DatumIndian1975, 24000, 47 to 48, south = false, 15.0) ++
        block("Indian 1960", DatumIndian1960, 3100, 48 to 49, south = false, 10.5) ++
        block("Kertau 1968", DatumKertau, 24500, 47 to 48, south = false, 4.0) ++
        block("Minna", DatumMinna, 26300, 31 to 32, south = false, 9.0) ++
        block("Nahrwan 1967", DatumNahrwan67, 27000, 38 to 40, south = false, 25.0) ++
        block("Nord Sahara 1959", DatumNordSahara, 30700, 29 to 32, south = false, 30.0) ++
        block("Tokyo", DatumTokyo, 3041, 51 to 55, south = false, 35.0) ++
        block("Cape", DatumCape, 22200, 34 to 35, south = true, -30.0) ++
        block("SAD69", DatumSad69, 29150, 18 to 22, south = false, 5.0) ++
        block("SAD69", DatumSad69, 29170, 17 to 25, south = true, -15.0)).toMap
    }
    // PRS92 / Philippines TM zones 1-5 (3121-3125): lon_0 = 117 + 2·(zone−1)
    val prs92Tm = (1 to 5).map { z =>
      val lon0 = 117.0 + 2 * (z - 1)
      s"EPSG:${3120 + z}" -> tm(s"PRS92 / Philippines zone $z", 0, lon0, 0.99995,
        500000, 0, DatumPrs92, probe = (lon0 + 0.4, 12.0))
    }.toMap
    // TWD97 (Taiwan, GRS80 null transform): the two TM2 belts
    val twd97 = Map(
      "EPSG:3826" -> tm("TWD97 / TM2 zone 121", 0, 121, 0.9999, 250000, 0, g, probe = (121.5, 24.0)),
      "EPSG:3825" -> tm("TWD97 / TM2 zone 119", 0, 119, 0.9999, 250000, 0, g, probe = (119.5, 23.5)))
    val batch14 = pulkovo42Bulk ++ legacyUtm ++ prs92Tm ++ twd97

    val merged = base ++ japan ++ franceCC ++ loZones ++ usSpcsTm ++ usSpcsLcc ++ europe ++
      ups ++ asiaPacific ++ europe2 ++ europe3 ++ canadaMtm ++ batch4 ++ batch5 ++ batch6 ++ batch7 ++ batch8 ++ batch9 ++ batch11 ++ batch12 ++ batch13 ++ batch14

    // ------------------------- NAD83(HARN) / NAD83(2011) State Plane
    // realizations (round 10). The EPSG dataset reuses the SPCS83 zone
    // conversion verbatim for every NAD83 realization — only the datum
    // name changes, and HARN/2011 agree with NAD83 (and WGS84) within this
    // chain's accuracy class — so the entries DERIVE from the registered
    // NAD83 base zones: same kernel object, renamed. HARN meter codes are
    // the published contiguous 2759-2866 alphabetical block (zones HARN'd
    // later sit outside it: NC 3358, SC 3360, PA 3362/3363); the 2011
    // entries cover the anchors whose meter codes are unambiguous in the
    // interleaved 6355+ block (AL, AK 1-10, CA 1-6, CO, CT, DE, FL North).
    def realized(tag: String)(pairs: (Int, Int)*): Map[String, Crs] =
      pairs.flatMap { case (code, baseCode) =>
        merged.get(s"EPSG:$baseCode").map { c =>
          s"EPSG:$code" -> c.copy(name = c.name.replace("NAD83 /", s"NAD83($tag) /"))
        }
      }.toMap
    val harn = realized("HARN")(
      2759 -> 26929, 2760 -> 26930,                                   // Alabama E/W
      2764 -> 26951, 2765 -> 26952,                                   // Arkansas N/S
      2766 -> 26941, 2767 -> 26942, 2768 -> 26943,                    // California 1-6
      2769 -> 26944, 2770 -> 26945, 2771 -> 26946,
      2772 -> 26953, 2773 -> 26954, 2774 -> 26955,                    // Colorado N/C/S
      2775 -> 26956, 2776 -> 26957, 2779 -> 26960,                    // CT, DE, FL North
      2782 -> 26961, 2783 -> 26962, 2784 -> 26963,                    // Hawaii 1-5
      2785 -> 26964, 2786 -> 26965,
      2787 -> 26968, 2788 -> 26969, 2789 -> 26970,                    // Idaho E/C/W
      2792 -> 26973, 2793 -> 26974,                                   // Indiana E/W
      2794 -> 26975, 2795 -> 26976,                                   // Iowa N/S
      2796 -> 26977, 2797 -> 26978,                                   // Kansas N/S
      2798 -> 26979, 2799 -> 26980,                                   // Kentucky N/S
      2800 -> 26981, 2801 -> 26982,                                   // Louisiana N/S
      2802 -> 26983, 2803 -> 26984, 2804 -> 26985,                    // Maine E/W, MD
      2805 -> 26986, 2806 -> 26987,                                   // Massachusetts
      2807 -> 26988, 2808 -> 26989, 2809 -> 26990,                    // Michigan N/C/S
      2810 -> 26991, 2811 -> 26992, 2812 -> 26993,                    // Minnesota N/C/S
      2813 -> 26994, 2814 -> 26995,                                   // Mississippi E/W
      2815 -> 26996, 2816 -> 26997, 2817 -> 26998,                    // Missouri E/C/W
      2818 -> 32100, 2819 -> 32104,                                   // Montana, Nebraska
      2820 -> 32107, 2821 -> 32108, 2822 -> 32109,                    // Nevada E/C/W
      2823 -> 32110, 2824 -> 32111,                                   // NH, NJ
      2825 -> 32112, 2826 -> 32113, 2827 -> 32114,                    // New Mexico E/C/W
      2831 -> 32118,                                                  // NY Long Island
      2832 -> 32120, 2833 -> 32121,                                   // North Dakota N/S
      2834 -> 32122, 2835 -> 32123,                                   // Ohio N/S
      2836 -> 32124, 2837 -> 32125,                                   // Oklahoma N/S
      2838 -> 32126, 2839 -> 32127,                                   // Oregon N/S
      2840 -> 32130,                                                  // Rhode Island
      2841 -> 32134, 2842 -> 32135, 2843 -> 32136,                    // SD N/S, Tennessee
      2844 -> 32137, 2845 -> 32138, 2846 -> 32139,                    // Texas N/NC/C/SC/S
      2847 -> 32140, 2848 -> 32141,
      2849 -> 32142, 2850 -> 32143, 2851 -> 32144, 2852 -> 32145,     // Utah N/C/S, VT
      2853 -> 32146, 2854 -> 32147,                                   // Virginia N/S
      2855 -> 32148, 2856 -> 32149,                                   // Washington N/S
      2857 -> 32150, 2858 -> 32151,                                   // West Virginia N/S
      2859 -> 32152, 2860 -> 32153, 2861 -> 32154,                    // Wisconsin N/C/S
      2862 -> 32155, 2863 -> 32156, 2864 -> 32157, 2865 -> 32158,     // Wyoming E/EC/WC/W
      2866 -> 32161,                                                  // Puerto Rico & VI
      3358 -> 32119, 3360 -> 32133,                                   // NC, SC (late HARN)
      3362 -> 32128, 3363 -> 32129)                                   // Pennsylvania N/S
    val n2011 = realized("2011")(
      6355 -> 26929, 6356 -> 26930,                                   // Alabama E/W
      6394 -> 26931, 6395 -> 26932, 6396 -> 26933, 6397 -> 26934,     // Alaska 1-10
      6398 -> 26935, 6399 -> 26936, 6400 -> 26937, 6401 -> 26938,
      6402 -> 26939, 6403 -> 26940,
      6415 -> 26941, 6417 -> 26942, 6419 -> 26943,                    // California 1-6
      6421 -> 26944, 6423 -> 26945, 6425 -> 26946,                    // (ftUS interleave)
      6427 -> 26954, 6429 -> 26953, 6431 -> 26955,                    // Colorado C/N/S
      6433 -> 26956, 6435 -> 26957, 6440 -> 26960)                    // CT, DE, FL North

    // NAD83 State Plane foot variants, the published 2225-2289 alphabetical
    // block (EPSG:2263 NY Long Island, registered independently from the
    // reference's taxi_zones.prj fixture, sits exactly where this ordering
    // predicts — the block's consistency anchor). SPCS83 is legally metric;
    // EPSG's foot-variant grids are the EXACT unit conversion of the meter
    // conversion (ftUS = m × 3937/1200: 300000 m = 984250 ftUS, 600000 m =
    // 1968500 ftUS — exact), so each entry is the meter kernel viewed
    // through InUnits. MI/MT/ND/OR/SC/UT legislated the international foot.
    def inFeet(foot: Double)(pairs: (Int, Int)*): Map[String, Crs] = {
      val (tag, units) = if (foot == UsFoot) ("ftUS", "us-ft") else ("ft", "ft")
      pairs.flatMap { case (code, baseCode) =>
        merged.get(s"EPSG:$baseCode").map { c =>
          s"EPSG:$code" -> c.copy(
            name = s"${c.name} ($tag)",
            proj = new InUnits(c.proj, foot, 0, 0),
            proj4 = if (c.proj4 == null) null
                    else c.proj4.replace("+units=m", s"+units=$units"))
        }
      }.toMap
    }
    val spcsFtUs = inFeet(UsFoot)(
      2225 -> 26941, 2226 -> 26942, 2227 -> 26943,                    // California 1-6
      2228 -> 26944, 2229 -> 26945, 2230 -> 26946,
      2231 -> 26953, 2232 -> 26954, 2233 -> 26955,                    // Colorado N/C/S
      2234 -> 26956, 2235 -> 26957, 2238 -> 26960,                    // CT, DE, FL North
      2241 -> 26968, 2242 -> 26969, 2243 -> 26970,                    // Idaho E/C/W
      2244 -> 26973, 2245 -> 26974,                                   // Indiana E/W
      2246 -> 26979, 2247 -> 26980,                                   // Kentucky N/S
      2248 -> 26985, 2249 -> 26986, 2250 -> 26987,                    // MD, MA Mainland/Island
      2254 -> 26994, 2255 -> 26995,                                   // Mississippi E/W
      2257 -> 32112, 2258 -> 32113, 2259 -> 32114,                    // New Mexico E/C/W
      2264 -> 32119,                                                  // North Carolina
      2267 -> 32124, 2268 -> 32125,                                   // Oklahoma N/S
      2271 -> 32128, 2272 -> 32129,                                   // Pennsylvania N/S
      2274 -> 32136,                                                  // Tennessee
      2275 -> 32137, 2276 -> 32138, 2277 -> 32139,                    // Texas N/NC/C/SC/S
      2278 -> 32140, 2279 -> 32141,
      2283 -> 32146, 2284 -> 32147,                                   // Virginia N/S
      2285 -> 32148, 2286 -> 32149,                                   // Washington N/S
      2287 -> 32152, 2288 -> 32153, 2289 -> 32154)                    // Wisconsin N/C/S
    val spcsFtIntl = inFeet(0.3048)(
      2251 -> 26988, 2252 -> 26989, 2253 -> 26990,                    // Michigan N/C/S
      2256 -> 32100,                                                  // Montana
      2265 -> 32120, 2266 -> 32121,                                   // North Dakota N/S
      2269 -> 32126, 2270 -> 32127,                                   // Oregon N/S
      2273 -> 32133,                                                  // South Carolina
      2280 -> 32142, 2281 -> 32143, 2282 -> 32144)                    // Utah N/C/S
    merged ++ harn ++ n2011 ++ spcsFtUs ++ spcsFtIntl
  }

  // UTM-style zone families resolved by pattern; instances cached (the Krüger
  // series construction is ~100 flops — fine once, wasteful per point).
  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[String, Crs]()
  private def utmCrs(code: String, name: String, zone: Int, south: Boolean, d: Datum,
                     probeLat: Double = Double.NaN): Crs =
    zoneCache.computeIfAbsent(code, _ => Crs(name,
      new TransMerc(d.el, 0, zone * 6 - 183, 0.9996, 500000, if (south) 10000000 else 0),
      d, ((zone * 6 - 183).toDouble,
        if (!probeLat.isNaN) probeLat else if (south) -30.0 else 30.0),
      s"+proj=utm +zone=$zone${if (south) " +south" else ""} ${datumTags(d)} +units=m +no_defs"))

  /** Pulkovo 1942 / Gauss-Krüger 6° zones (EPSG:28402-28432, zone = code-28400):
   *  tmerc k=1 on Krassowsky 1940, FE = zone·10⁶+500000. Datum accuracy note
   *  on [[DatumPulkovo42]]. */
  private def pulkovoGkCrs(code: String, zone: Int): Crs =
    zoneCache.computeIfAbsent(code, _ => {
      val lon0r = 6 * zone - 3
      val lon0 = if (lon0r > 180) lon0r - 360.0 else lon0r.toDouble
      Crs(s"Pulkovo 1942 / Gauss-Kruger zone $zone",
        new TransMerc(Krass1940, 0, lon0, 1.0, zone * 1e6 + 500000, 0), DatumPulkovo42,
        (lon0 + 0.5, 55.0),
        s"+proj=tmerc +lat_0=0 +lon_0=${fmtP(lon0)} +k=1 +x_0=${fmtP(zone * 1e6 + 500000)} " +
          "+y_0=0 +ellps=krass +towgs84=28,-130,-95 +units=m +no_defs")
    })
  /** POSGAR Gauss-Krüger fajas 1-7 (Argentina): tmerc lat0=-90 k=1 on GRS80,
   *  lon0 = 3·faja − 75, FE = faja·10⁶+500000. POSGAR 94 and 98 share GRS80
   *  at this chain's accuracy class. */
  private def posgarCrs(code: String, frame: String, faja: Int): Crs =
    zoneCache.computeIfAbsent(code, _ => {
      val lon0 = 3.0 * faja - 75.0
      Crs(s"POSGAR $frame / Argentina $faja",
        new TransMerc(Grs80, -90, lon0, 1.0, faja * 1e6 + 500000, 0), DatumGrs80,
        (lon0 + 0.5, -35.0),
        s"+proj=tmerc +lat_0=-90 +lon_0=${fmtP(lon0)} +k=1 +x_0=${fmtP(faja * 1e6 + 500000)} " +
          "+y_0=0 +ellps=GRS80 +units=m +no_defs")
    })

  /** CGCS2000 Gauss-Krüger families (EPSG:4491-4554): the CGCS2000
   *  ellipsoid's 1/f=298.257222101 is GRS80 to the published precision, and
   *  the frame aligns with WGS84 at this chain's accuracy (no shift).
   *  Four sub-families: 6° zones 13-23 (zone-prefixed FE), 6° CM variants
   *  (FE=500000), 3° zones 25-45, 3° CM variants. */
  private def cgcsCrs(code: String, n: Int): Crs =
    zoneCache.computeIfAbsent(code, _ => {
      val (name, lon0, fe) =
        if (n <= 4501) { val z = 13 + (n - 4491); (s"CGCS2000 / Gauss-Kruger zone $z", 6.0 * z - 3, z * 1e6 + 500000) }
        else if (n <= 4512) { val cm = 75 + 6 * (n - 4502); (s"CGCS2000 / Gauss-Kruger CM ${cm}E", cm.toDouble, 500000.0) }
        else if (n <= 4533) { val z = 25 + (n - 4513); (s"CGCS2000 / 3-degree Gauss-Kruger zone $z", 3.0 * z, z * 1e6 + 500000) }
        else { val cm = 75 + 3 * (n - 4534); (s"CGCS2000 / 3-degree Gauss-Kruger CM ${cm}E", cm.toDouble, 500000.0) }
      Crs(name, new TransMerc(Grs80, 0, lon0, 1.0, fe, 0), DatumGrs80, (lon0 + 0.4, 36.0),
        s"+proj=tmerc +lat_0=0 +lon_0=${fmtP(lon0)} +k=1 +x_0=${fmtP(fe)} +y_0=0 " +
          "+ellps=GRS80 +units=m +no_defs")
    })

  /** Beijing 1954 / Xian 1980 Gauss-Krüger families (round 12 — the legacy
   *  Chinese national grids; EPSG parameter structure identical to CGCS2000's
   *  four sub-family layout, on their own datums/ellipsoids):
   *  Beijing 6° zones 13-23 (21413-21423), 6° CM (21453-21463),
   *  3° zones 25-45 (2401-2421), 3° CM (2422-2442);
   *  Xian 6° zones (2327-2337), 6° CM (2338-2348), 3° zones (2349-2369),
   *  3° CM (2370-2390). */
  private def chinaGkCrs(code: String, frame: String, d: Datum,
      lon0: Double, fe: Double, name: String): Crs =
    zoneCache.computeIfAbsent(code, _ =>
      Crs(s"$frame / $name", new TransMerc(d.el, 0, lon0, 1.0, fe, 0), d, (lon0 + 0.4, 36.0),
        s"+proj=tmerc +lat_0=0 +lon_0=${fmtP(lon0)} +k=1 +x_0=${fmtP(fe)} +y_0=0 " +
          s"${datumTags(d)} +units=m +no_defs"))
  private def gk6Zone(z: Int) = (s"Gauss-Kruger zone $z", 6.0 * z - 3, z * 1e6 + 500000)
  private def gk6Cm(z: Int) = (s"Gauss-Kruger CM ${6 * z - 3}E", 6.0 * z - 3, 500000.0)
  private def gk3Zone(z: Int) = (s"3-degree Gauss-Kruger zone $z", 3.0 * z, z * 1e6 + 500000)
  private def gk3Cm(cm: Int) = (s"3-degree Gauss-Kruger CM ${cm}E", cm.toDouble, 500000.0)

  // New Beijing ships only the 6° families in the 4555-4589 block (the 3°
  // families have no EPSG codes there — the 46xx range holds geographic
  // CRSes like 4674 SIRGAS 2000, which the registry round-trip sweep guards)
  private val NewBeijingGk6 = "EPSG:45(6[8-9]|7[0-8])".r   // 6° zones 13-23
  private val NewBeijingGk6Cm = "EPSG:45(79|8[0-9])".r     // 6° CM 75E-135E
  private val BeijingGk6 = "EPSG:214(1[3-9]|2[0-3])".r     // 6° zones 13-23
  private val BeijingGk6Cm = "EPSG:214(5[3-9]|6[0-3])".r   // 6° CM 75E-135E
  private val BeijingGk3 = "EPSG:24(0[1-9]|1[0-9]|2[01])".r  // 3° zones 25-45
  private val BeijingGk3Cm = "EPSG:24(2[2-9]|3[0-9]|4[0-2])".r // 3° CM 75E-135E
  private val XianGk = "EPSG:23(2[7-9]|[3-8][0-9]|90)".r   // all four Xian families

  private val PulkovoGk = "EPSG:284(0[2-9]|[12][0-9]|3[0-2])".r  // zones 2-32
  private val Posgar98 = "EPSG:2217([1-7])".r                    // fajas 1-7
  private val Posgar94 = "EPSG:2218([1-7])".r
  private val Nad83Utm = "EPSG:269(0[1-9]|1[0-9]|2[0-3])".r // NAD83 / UTM 1N-23N
  private val Mga94 = "EPSG:283(4[89]|5[0-8])".r            // GDA94 / MGA 48-58
  private val Mga2020 = "EPSG:78(4[6-9]|5[0-9])".r          // GDA2020 / MGA 46-59
  private val SirgasN = "EPSG:319(6[5-9]|7[0-6])".r         // SIRGAS 2000 / UTM 11N-22N
  private val SirgasS = "EPSG:319(7[7-9]|8[0-5])".r         // SIRGAS 2000 / UTM 17S-25S
  private val Ed50Utm = "EPSG:230(2[89]|3[0-8])".r          // ED50 / UTM 28N-38N
  private val Etrs89Utm = "EPSG:258(2[89]|3[0-8])".r        // ETRS89 / UTM 28N-38N
  private val Nad2011Utm = "EPSG:63(3[0-9]|4[0-8])".r       // NAD83(2011) / UTM 1N-19N (6330-6348)
  private val Nad27Utm = "EPSG:267(0[3-9]|1[0-9]|2[0-2])".r // NAD27 / UTM 3N-22N
  private val Agd66Amg = "EPSG:202(49|5[0-6])".r            // AGD66 / AMG 49-56
  private val Agd84Amg = "EPSG:203(49|5[0-6])".r            // AGD84 / AMG 49-56
  private val Cgcs2000 = "EPSG:(449[1-9]|45[0-4][0-9]|455[0-4])".r // 4491-4554
  private val Wgs72UtmN = "EPSG:322(0[1-9]|[1-5][0-9]|60)".r // WGS 72 / UTM 1N-60N
  private val Wgs72UtmS = "EPSG:323(0[1-9]|[1-5][0-9]|60)".r // WGS 72 / UTM 1S-60S
  private val EtrsTm = "EPSG:30(3[89]|4[0-9]|5[01])".r       // ETRS89 / ETRS-TM26..39 (3038-3051)
  private val Posgar07 = "EPSG:534([3-9])".r                 // POSGAR 2007 fajas 1-7

  // --------------------------------------------- PROJ parameter strings
  // `+proj=…` input turns the bounded EPSG registry into unbounded coverage
  // for the methods already implemented: any parameterization of the 8
  // kernels comes free. Unsupported methods/datums/params are rejected
  // loudly (same policy as unknown EPSG codes). Reference accepts any PROJ
  // CRS via its embedded proj.db (proj/module.cpp:14-47); this is the
  // kernel-scoped equivalent.

  /** +proj=longlat: coordinates already lon/lat degrees on the datum. */
  private object LonLatIdentity extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = (lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  private val projStrCache = new java.util.concurrent.ConcurrentHashMap[String, Crs]()

  /** Parse a PROJ.4-style parameter string onto the implemented kernels.
   *  Returns None for non-`+`-strings; throws (loudly, naming the offender)
   *  for `+proj=` strings using an unimplemented method or parameter. */
  def fromProjString(str: String): Option[Crs] = {
    val t = str.trim
    if (!t.startsWith("+")) None
    else Some(projStrCache.computeIfAbsent(t, parseProjString))
  }

  private def parseProjString(str: String): Crs = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"ST_Transform: $msg in PROJ string '$str'")
    val kv: Map[String, String] = str.split("\\s+").iterator
      .filter(_.startsWith("+")).map(_.drop(1)).map { tok =>
        val i = tok.indexOf('=')
        if (i < 0) (tok, "") else (tok.take(i), tok.drop(i + 1))
      }.toMap
    def num(k: String, default: => Double): Double =
      kv.get(k).map { v =>
        try v.toDouble
        catch { case _: NumberFormatException => fail(s"non-numeric +$k=$v (decimal degrees/meters only)") }
      }.getOrElse(default)

    val method = kv.getOrElse("proj", fail("missing +proj"))

    val datum: Datum = kv.get("datum") match {
      case Some("WGS84") => DatumWgs84
      case Some("NAD83") => DatumGrs80
      case Some("OSGB36") => DatumOsgb36
      case Some("ire65") => DatumTm75
      case Some(d) => fail(s"unsupported +datum=$d (supported: WGS84, NAD83, OSGB36, ire65; or give +ellps/+a,+rf and +towgs84)")
      case None =>
        val el = kv.get("ellps") match {
          case Some("WGS84") => Wgs84
          case Some("GRS80") => Grs80
          case Some("airy") => Airy1830
          case Some("mod_airy") => AiryModified
          case Some("intl") => Intl1924
          case Some("clrk66") => Clarke1866
          case Some("bessel") => Bessel1841
          case Some("evrst69") => Everest1967
          case Some("aust_SA") => Grs67Mod
          case Some("clrk58") => Clarke1858 // graft extension; PROJ spells it +a/+rf
          case Some("krass") => Krass1940
          case Some("clrk80ign") => Clarke1880Ign
          case Some("evrst30") => Everest1937
          case Some("evrst48") => Everest1948
          case Some("helmert") => Helmert1906
          case Some("clrk80") => Clarke1880Rgs
          case Some(e) => fail(s"unsupported +ellps=$e (supported: WGS84, GRS80, airy, mod_airy, intl, clrk66, bessel, evrst69, evrst30, evrst48, aust_SA, clrk58, krass, clrk80, clrk80ign, helmert; or +a with +rf)")
          case None if kv.contains("a") && kv.contains("rf") => Ellipsoid(num("a", 0), num("rf", 0))
          case None if kv.contains("R") => Ellipsoid(num("R", 0), Double.PositiveInfinity)
          case None if kv.contains("a") && kv.contains("b") =>
            val a = num("a", 0); val b = num("b", 0)
            if (a == b) Ellipsoid(a, Double.PositiveInfinity) else Ellipsoid(a, a / (a - b))
          case None if kv.contains("a") || kv.contains("rf") || kv.contains("b") =>
            fail("custom ellipsoids need +a with +rf (or +b), or a sphere via +R")
          case None => Wgs84 // PROJ.4's historic default ellipsoid
        }
        // +towgs84 is position-vector convention — the same EPSG 9606 Helmert
        val shift = kv.get("towgs84").map { s =>
          val p = s.split(",").map(v => try v.trim.toDouble catch {
            case _: NumberFormatException => fail(s"non-numeric +towgs84=$s")
          })
          p.length match {
            case 3 => Helmert(p(0), p(1), p(2), 0, 0, 0, 0)
            case 7 => Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
            case n => fail(s"+towgs84 needs 3 or 7 parameters, got $n")
          }
        }.filter(h => h != Helmert(0, 0, 0, 0, 0, 0, 0))
        Datum(el, shift)
    }
    // +nadgrids supersedes +towgs84 (PROJ precedence); `@path` entries are
    // optional, `null` is the no-op sentinel — a list resolving to nothing
    // leaves the Helmert (or no-shift) datum in place.
    val datumG = kv.get("nadgrids").flatMap(NtV2.fromNadgridsSpec) match {
      case Some(grid) => datum.copy(shift = None, grid = Some(grid))
      case None => datum
    }
    val el = datumG.el

    def p(k: String) = num(k, 0.0)
    val (base: Projection, probe: (Double, Double)) = method match {
      case "longlat" | "latlong" | "lonlat" => (LonLatIdentity, (10.0, 45.0))
      case "lcc" =>
        if (!kv.contains("lat_2")) {
          // 1SP (EPSG 9801): +lat_1 is the single standard parallel (= the
          // latitude of origin in PROJ's spelling), scale via +k_0
          val lat1 = num("lat_1", p("lat_0"))
          (new Lcc1SP(el, lat1, p("lon_0"), num("k", num("k_0", 1.0)), p("x_0"), p("y_0")),
            (num("lon_0", 0), lat1))
        } else {
          val lat1 = num("lat_1", p("lat_0")); val lat2 = p("lat_2")
          (new Lcc2SP(el, lat1, lat2, p("lat_0"), p("lon_0"), p("x_0"), p("y_0")),
            (num("lon_0", 0), (lat1 + lat2) / 2))
        }
      case "aea" =>
        val lat1 = num("lat_1", 29.5); val lat2 = num("lat_2", 45.5) // PROJ defaults
        (new Albers(el, lat1, lat2, p("lat_0"), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0), (lat1 + lat2) / 2))
      case "laea" =>
        val lat0 = p("lat_0")
        (new Laea(el, lat0, p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0), math.max(-80, math.min(80, lat0 + 5))))
      case "tmerc" =>
        val base = new TransMerc(el, p("lat_0"), p("lon_0"), num("k", num("k_0", 1.0)), p("x_0"), p("y_0"))
        // +axis=wsu = south-oriented grid (EPSG 9808; South African Lo)
        val oriented: Projection = kv.get("axis") match {
          case Some("wsu") => new SouthOriented(base)
          case Some("enu") | None => base
          case Some(a) => fail(s"unsupported +axis=$a (enu or wsu)")
        }
        (oriented,
          (num("lon_0", 0) + 1,
            if (kv.get("axis").contains("wsu")) -29.0
            else math.max(-80, math.min(80, num("lat_0", 30)))))
      case "sterea" =>
        (new Sterea(el, p("lat_0"), p("lon_0"), num("k", num("k_0", 1.0)), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 0.3, math.max(-80, math.min(80, num("lat_0", 50) + 0.3))))
      case "somerc" =>
        (new Somerc(el, p("lat_0"), p("lon_0"), num("k", num("k_0", 1.0)), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 0.5, math.max(-80, math.min(80, num("lat_0", 46) + 0.3))))
      case "krovak" =>
        // PROJ defaults mirror the S-JTSK definition
        (new Krovak(el, num("lat_0", 49.5), num("lon_0", dms(24, 50)),
          num("alpha", dms(30, 17, 17.3031)), num("lat_1", 78.5),
          num("k", num("k_0", 0.9999)), p("x_0"), p("y_0")),
          (num("lon_0", dms(24, 50)) - 8, 50.0))
      case "omerc" =>
        // PROJ spellings: +lonc (centre lon), +alpha, optional +gamma
        // (defaults to alpha), +no_uoff selects variant A (EPSG 9812)
        val lonC = num("lonc", p("lon_0"))
        val alpha = kv.get("alpha").map(_.toDouble).getOrElse(fail("+proj=omerc needs +alpha"))
        val gamma = num("gamma", alpha)
        (new Omerc(el, p("lat_0"), lonC, alpha, gamma, num("k", num("k_0", 1.0)),
          p("x_0"), p("y_0"), variantA = kv.contains("no_uoff")),
          (lonC + 0.5, math.max(-80, math.min(80, num("lat_0", 10) + 0.5))))
      case "utm" =>
        val zone = kv.get("zone").map(_.toInt).getOrElse(fail("+proj=utm needs +zone"))
        if (zone < 1 || zone > 60) fail(s"+zone=$zone out of range 1-60")
        val south = kv.contains("south")
        (new TransMerc(el, 0, zone * 6 - 183, 0.9996, 500000, if (south) 10000000 else 0),
          ((zone * 6 - 183).toDouble, if (south) -30.0 else 30.0))
      case "stere" =>
        val lat0 = num("lat_0", 90)
        if (math.abs(lat0) < 90 - 1e-9)
          fail("+proj=stere is implemented in polar aspect only (+lat_0=90 or -90)")
        // +lat_ts selects variant B (standard parallel); otherwise variant A
        // with the pole-scale +k (UPS: +k=0.994) — lat_ts=±90 would be 0/0
        val proj: Projection =
          if (kv.contains("lat_ts"))
            new PolarStereo(el, p("lat_ts"), p("lon_0"), p("x_0"), p("y_0"), north = lat0 > 0)
          else
            new PolarStereoA(el, num("k", num("k_0", 1.0)), p("lon_0"), p("x_0"), p("y_0"), north = lat0 > 0)
        (proj, (num("lon_0", 0), if (lat0 > 0) 80.0 else -80.0))
      case "merc" =>
        // variant B via lat_ts (k0 = m(lat_ts), Snyder 7-2), else variant A
        val k0 =
          if (kv.contains("lat_ts")) {
            val ts = math.toRadians(p("lat_ts"))
            math.cos(ts) / math.sqrt(1 - el.e2 * math.sin(ts) * math.sin(ts))
          } else num("k", num("k_0", 1.0))
        val inner = new MercatorEll(el, p("lon_0"), 0, 0)
        val proj = if (k0 == 1.0) new MercatorEll(el, p("lon_0"), p("x_0"), p("y_0"))
                   else new InUnits(inner, 1.0 / k0, p("x_0"), p("y_0"))
        (proj, (num("lon_0", 0) + 10, 30.0))
      case "cea" =>
        (new Cea(el, num("lat_ts", 0), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 10, 30.0))
      case "cass" =>
        (new CassiniSoldner(el, p("lat_0"), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 0.5, num("lat_0", 10) + 0.5))
      case "poly" =>
        (new Polyconic(el, p("lat_0"), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 3, math.max(-80, math.min(80, num("lat_0", 10) + 3))))
      case "eqc" =>
        // PROJ: +lat_ts is the standard parallel (method 1028's lat_1)
        (new EquidistantCyl(el, num("lat_ts", 0), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 10, 30.0))
      case "nzmg" =>
        // the method is DEFINED on International 1924 at (-41, 173); PROJ
        // hardcodes the same — reject contradictory parameters loudly
        if (el != Intl1924) fail("+proj=nzmg is defined on the International 1924 ellipsoid (+ellps=intl)")
        if (num("lat_0", -41) != -41.0 || num("lon_0", 173) != 173.0)
          fail("+proj=nzmg fixes lat_0=-41 lon_0=173 (EPSG method 9811)")
        (new Nzmg(num("x_0", 2510000), num("y_0", 6023150)), (174.78, -41.29))
      case "aeqd" =>
        if (!kv.contains("guam"))
          fail("+proj=aeqd is implemented in the Guam variant only (+guam, EPSG method 9831)")
        (new GuamAzEq(el, p("lat_0"), p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 0.05, num("lat_0", 10) + 0.05))
      // world / small-scale family (spherical per PROJ: radius = semimajor)
      case "moll" =>
        (new Mollweide(el.a, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 30.0))
      case "sinu" =>
        (new Sinusoidal(el, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 30.0))
      case "mill" =>
        (new MillerCyl(el.a, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 30.0))
      case "eck4" =>
        (new EckertIv(el.a, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 30.0))
      case "robin" =>
        // probe off the 5° nodes so round-trips exercise the spline segment
        (new Robinson(el.a, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 32.6))
      case "eqearth" =>
        // ellipsoid-exact via authalic latitude (like PROJ; sphere at e = 0)
        (new EqualEarth(el, p("lon_0"), p("x_0"), p("y_0")), (num("lon_0", 0) + 10, 30.0))
      case "ortho" =>
        val lat0 = p("lat_0")
        (new Orthographic(el.a, lat0, p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 5, math.max(-85, math.min(85, lat0 + 5))))
      case "gnom" =>
        val lat0 = p("lat_0")
        (new Gnomonic(el.a, lat0, p("lon_0"), p("x_0"), p("y_0")),
          (num("lon_0", 0) + 5, math.max(-85, math.min(85, lat0 + 5))))
      case m => fail(s"unsupported +proj=$m (implemented: longlat, lcc, aea, laea, tmerc, utm, stere [polar], merc, cea, omerc, somerc, krovak, sterea, cass, poly, eqc, aeqd [+guam], moll, sinu, robin, eck4, mill, eqearth, ortho, gnom)")
    }

    // +units/+to_meter: kernel computes meters (x_0/y_0 included, meters per
    // PROJ semantics); output divides by to_meter
    val toMeter = kv.get("to_meter").map(_.toDouble).orElse(kv.get("units").map {
      case "m" => 1.0
      case "us-ft" => UsFoot
      case "ft" => 0.3048
      case u => fail(s"unsupported +units=$u (m, ft, us-ft, or +to_meter)")
    }).getOrElse(1.0)
    val proj = if (toMeter == 1.0) base else new InUnits(base, toMeter, 0, 0)
    // a grid datum has bounded coverage: put the probe at the first
    // sub-grid's center so round-trip self-tests stay inside it
    val probeG = datumG.grid match {
      case Some(g) =>
        val sg = g.subGrids.head
        (-(sg.eLonW + sg.wLonW) / 2 / 3600.0, (sg.sLat + sg.nLat) / 2 / 3600.0)
      case None => probe
    }
    // +geoidgrids: vertical datum — heights in this CRS are orthometric
    // relative to the geoid surface the grids describe
    val vgrid = kv.get("geoidgrids").flatMap(Gtx.fromGeoidgridsSpec)
    // the input string IS this CRS's canonical +proj= record — keeping it
    // lets the WKT1/PROJJSON synthesis (COPY SRS stamping) accept custom
    // '+proj=' SRS spellings, not just registry codes
    Crs(s"PROJ:$method", proj, datumG, probeG, proj4 = str, vgrid = vgrid)
  }

  /** Resolve an EPSG code or `+proj=` parameter string to a CRS (named
   *  entries + zone families + PROJ strings). Geographic 4326/CRS84 and
   *  web-mercator 3857 are handled upstream (axis-order special cases). */
  def lookup(code: String): Option[Crs] =
    if (code.startsWith("+")) fromProjString(code)
    else registry.get(code).orElse(code match {
    case Nad83Utm(z) => Some(utmCrs(code, s"NAD83 / UTM zone ${z.toInt}N", z.toInt, south = false, DatumGrs80))
    case Mga94(z) => Some(utmCrs(code, s"GDA94 / MGA zone ${z.toInt}", z.toInt, south = true, DatumGrs80))
    case Mga2020(z) => Some(utmCrs(code, s"GDA2020 / MGA zone ${z.toInt}", z.toInt, south = true, DatumGda2020))
    case SirgasN(z) => Some(utmCrs(code, s"SIRGAS 2000 / UTM zone ${z.toInt - 54}N", z.toInt - 54, south = false, DatumGrs80))
    case SirgasS(z) => Some(utmCrs(code, s"SIRGAS 2000 / UTM zone ${z.toInt - 60}S", z.toInt - 60, south = true, DatumGrs80))
    case Ed50Utm(z) => Some(utmCrs(code, s"ED50 / UTM zone ${z.toInt}N", z.toInt, south = false, DatumEd50))
    case Etrs89Utm(z) => Some(utmCrs(code, s"ETRS89 / UTM zone ${z.toInt}N", z.toInt, south = false, DatumGrs80))
    case Nad2011Utm(z) => Some(utmCrs(code, s"NAD83(2011) / UTM zone ${z.toInt - 29}N", z.toInt - 29, south = false, DatumGrs80))
    case Nad27Utm(z) => Some(utmCrs(code, s"NAD27 / UTM zone ${z.toInt}N", z.toInt, south = false, DatumNad27))
    case Agd66Amg(z) => Some(utmCrs(code, s"AGD66 / AMG zone ${z.toInt}", z.toInt, south = true, DatumAgd66))
    case Agd84Amg(z) => Some(utmCrs(code, s"AGD84 / AMG zone ${z.toInt}", z.toInt, south = true, DatumAgd84))
    case Cgcs2000(n) => Some(cgcsCrs(code, n.toInt))
    case NewBeijingGk6(_) =>
      val (nm, l0, fe) = gk6Zone(code.drop(5).toInt - 4568 + 13)
      Some(chinaGkCrs(code, "New Beijing", DatumNewBeijing, l0, fe, nm))
    case NewBeijingGk6Cm(_) =>
      val (nm, l0, fe) = gk6Cm(code.drop(5).toInt - 4579 + 13)
      Some(chinaGkCrs(code, "New Beijing", DatumNewBeijing, l0, fe, nm))
    case BeijingGk6(_) =>
      val (nm, l0, fe) = gk6Zone(code.drop(5).toInt - 21400)
      Some(chinaGkCrs(code, "Beijing 1954", DatumBeijing54, l0, fe, nm))
    case BeijingGk6Cm(_) =>
      val (nm, l0, fe) = gk6Cm(code.drop(5).toInt - 21440)
      Some(chinaGkCrs(code, "Beijing 1954", DatumBeijing54, l0, fe, nm))
    case BeijingGk3(_) =>
      val (nm, l0, fe) = gk3Zone(code.drop(5).toInt - 2401 + 25)
      Some(chinaGkCrs(code, "Beijing 1954", DatumBeijing54, l0, fe, nm))
    case BeijingGk3Cm(_) =>
      val (nm, l0, fe) = gk3Cm(75 + 3 * (code.drop(5).toInt - 2422))
      Some(chinaGkCrs(code, "Beijing 1954", DatumBeijing54, l0, fe, nm))
    case XianGk(_) =>
      val n = code.drop(5).toInt
      val (nm, l0, fe) =
        if (n <= 2337) gk6Zone(n - 2327 + 13)
        else if (n <= 2348) gk6Cm(n - 2338 + 13)
        else if (n <= 2369) gk3Zone(n - 2349 + 25)
        else gk3Cm(75 + 3 * (n - 2370))
      Some(chinaGkCrs(code, "Xian 1980", DatumXian80, l0, fe, nm))
    case PulkovoGk(nn) => Some(pulkovoGkCrs(code, nn.toInt))
    case Posgar98(f) => Some(posgarCrs(code, "98", f.toInt))
    case Posgar94(f) => Some(posgarCrs(code, "94", f.toInt))
    case Posgar07(f) => Some(posgarCrs(code, "2007", f.toInt - 2))
    case Wgs72UtmN(z) => Some(utmCrs(code, s"WGS 72 / UTM zone ${z.toInt}N", z.toInt, south = false, DatumWgs72))
    case Wgs72UtmS(z) => Some(utmCrs(code, s"WGS 72 / UTM zone ${z.toInt}S", z.toInt, south = true, DatumWgs72))
    case EtrsTm(_) => // code = zone + 3012
      val z = code.drop(5).toInt - 3012
      Some(utmCrs(code, s"ETRS89 / ETRS-TM$z", z, south = false, DatumGrs80))
    case _ => None
  })

  /** Geographic (lon/lat) CRSes: modern frames are WGS84-equivalent at the
   *  sub-meter level; legacy ones go through their Helmert. Coordinates are
   *  taken as lon/lat under always_xy semantics (like EPSG:4326 upstream). */
  val geographic: Map[String, (String, Datum)] = Map(
    "EPSG:4258" -> (("ETRS89", DatumGrs80)),
    "EPSG:4269" -> (("NAD83", DatumGrs80)),
    "EPSG:4283" -> (("GDA94", DatumGrs80)),
    "EPSG:7844" -> (("GDA2020", DatumGda2020)),
    // dynamic ITRF realizations = the hub itself (WGS84 ≈ ITRF2014 at ~cm,
    // and successive ITRFs agree to ~mm — both below this chain's class);
    // their value is as the epoch-tagged SOURCE/TARGET of a plate-fixed
    // frame: st_transform(g, 'EPSG:9000@2025.5', 'EPSG:7844')
    "EPSG:8999" -> (("ITRF2008", DatumGrs80)),
    "EPSG:9000" -> (("ITRF2014", DatumGrs80)),
    "EPSG:9990" -> (("ITRF2020", DatumGrs80)),
    "EPSG:4171" -> (("RGF93", DatumGrs80)),
    "EPSG:4167" -> (("NZGD2000", DatumGrs80)),
    "EPSG:4612" -> (("JGD2000", DatumGrs80)),
    "EPSG:6668" -> (("JGD2011", DatumGrs80)),
    "EPSG:4674" -> (("SIRGAS 2000", DatumGrs80)),
    "EPSG:4277" -> (("OSGB36", DatumOsgb36)),
    "EPSG:4299" -> (("TM65 (Ireland)", DatumTm75)),
    "EPSG:4230" -> (("ED50", DatumEd50)),
    "EPSG:4314" -> (("DHDN", DatumDhdn)),
    "EPSG:4312" -> (("MGI", DatumMgi)),
    "EPSG:3906" -> (("MGI 1901", DatumMgi1901)),
    "EPSG:4121" -> (("GGRS87", DatumGgrs87)),
    "EPSG:4275" -> (("NTF", DatumNtf)),
    "EPSG:4313" -> (("BD72", DatumBd72)),
    "EPSG:4284" -> (("Pulkovo 1942", DatumPulkovo42)),
    // batch 9 (round 12)
    "EPSG:4214" -> (("Beijing 1954", DatumBeijing54)),
    "EPSG:4610" -> (("Xian 1980", DatumXian80)),
    "EPSG:4555" -> (("New Beijing", DatumNewBeijing)),
    "EPSG:4618" -> (("SAD69", DatumSad69)),
    // batch 4 (round 10)
    "EPSG:4301" -> (("Tokyo", DatumTokyo)),
    "EPSG:4617" -> (("NAD83(CSRS)", DatumGrs80)),
    // batch 11 (round 13): the NAD83(CSRS) epoch ladder (all GRS80; the
    // realizations differ at the cm level — below this chain's class) and
    // the South American SIRGAS-aligned frames
    "EPSG:8232" -> (("NAD83(CSRS96)", DatumGrs80)),
    "EPSG:8237" -> (("NAD83(CSRS)v2", DatumGrs80)),
    "EPSG:8240" -> (("NAD83(CSRS)v3", DatumGrs80)),
    "EPSG:8246" -> (("NAD83(CSRS)v4", DatumGrs80)),
    "EPSG:8249" -> (("NAD83(CSRS)v5", DatumGrs80)),
    "EPSG:8252" -> (("NAD83(CSRS)v6", DatumGrs80)),
    "EPSG:8255" -> (("NAD83(CSRS)v7", DatumGrs80)),
    "EPSG:4170" -> (("SIRGAS 1995", DatumGrs80)),
    "EPSG:4686" -> (("MAGNA-SIRGAS", DatumGrs80)),
    "EPSG:4189" -> (("REGVEN", DatumGrs80)),
    "EPSG:5373" -> (("Peru96", DatumGrs80)),
    "EPSG:5381" -> (("SIRGAS-ROU98", DatumGrs80)),
    "EPSG:4221" -> (("Campo Inchauspe", DatumCampo)),
    "EPSG:4490" -> (("China Geodetic Coordinate System 2000", DatumGrs80)),
    "EPSG:4148" -> (("Hartebeesthoek94", DatumGrs80)),
    "EPSG:4483" -> (("Mexico ITRF92", DatumGrs80)),
    "EPSG:6365" -> (("Mexico ITRF2008", DatumGrs80)),
    "EPSG:4248" -> (("PSAD56", DatumPsad56)),
    "EPSG:4317" -> (("Dealul Piscului 1970", DatumDealul70)),
    // batch 6 (round 10)
    "EPSG:4322" -> (("WGS 72", DatumWgs72)),
    "EPSG:4123" -> (("KKJ", DatumKkj)),
    "EPSG:4124" -> (("RT90", DatumRt90)),
    "EPSG:4272" -> (("NZGD49", DatumNzgd49)),
    "EPSG:4274" -> (("Datum 73", DatumD73)),
    "EPSG:4204" -> (("Ain el Abd", DatumAinElAbd)),
    // batch 7 (round 11)
    "EPSG:4239" -> (("Indian 1954", DatumIndian1954)),
    "EPSG:4240" -> (("Indian 1975", DatumIndian1975)),
    "EPSG:4146" -> (("Kalianpur 1975", DatumKalianpur75)),
    "EPSG:4244" -> (("Kandawala", DatumKandawala)),
    "EPSG:4756" -> (("VN-2000", DatumVn2000)),
    "EPSG:4245" -> (("Kertau 1968", DatumKertau)),
    "EPSG:4211" -> (("Batavia", DatumBatavia)),
    "EPSG:4755" -> (("DGN95", DatumDgn95)),
    "EPSG:4742" -> (("GDM2000", DatumGrs80)),
    "EPSG:4683" -> (("PRS92", DatumPrs92)),
    "EPSG:4134" -> (("PSD93", DatumPsd93)),
    "EPSG:4285" -> (("Qatar 1974", DatumQatar74)),
    "EPSG:4270" -> (("Nahrwan 1967", DatumNahrwan67)),
    "EPSG:4209" -> (("Arc 1950", DatumArc1950)),
    "EPSG:4210" -> (("Arc 1960", DatumArc1960)),
    "EPSG:4201" -> (("Adindan", DatumAdindan)),
    "EPSG:4229" -> (("Egypt 1907", DatumEgypt1907)),
    "EPSG:4263" -> (("Minna", DatumMinna)),
    "EPSG:4222" -> (("Cape", DatumCape)),
    "EPSG:4307" -> (("Nord Sahara 1959", DatumNordSahara)),
    "EPSG:4223" -> (("Carthage", DatumCarthage)),
    "EPSG:4261" -> (("Merchich", DatumMerchich)),
    "EPSG:4265" -> (("Monte Mario", DatumMonteMario)),
    // batch 8 (round 11)
    "EPSG:4238" -> (("ID74", DatumId74)),
    "EPSG:4218" -> (("Bogota 1975", DatumBogota)),
    "EPSG:4281" -> (("Palestine 1923", DatumPalestine)),
    // batch 12 (round 14)
    "EPSG:4141" -> (("Israel 1993", DatumIsrael93)),
    "EPSG:4227" -> (("Deir ez Zor", DatumDeirEzZor)),
    "EPSG:4297" -> (("Tananarive", DatumTananarive)),
    "EPSG:4250" -> (("Leigon", DatumLeigon)),
    "EPSG:4142" -> (("Locodjo 1965", DatumLocodjo)),
    "EPSG:4143" -> (("Abidjan 1987", DatumAbidjan)),
    "EPSG:4601" -> (("Antigua 1943", DatumAntigua43)),
    "EPSG:4602" -> (("Dominica 1945", DatumDominica45)),
    "EPSG:4603" -> (("Grenada 1953", DatumGrenada53)),
    "EPSG:4604" -> (("Montserrat 1958", DatumMontserrat58)),
    "EPSG:4605" -> (("St. Kitts 1955", DatumStKitts55)),
    "EPSG:4606" -> (("St. Lucia 1955", DatumStLucia55)),
    "EPSG:4607" -> (("St. Vincent 1945", DatumStVincent45)),
    // batch 13 (round 15)
    "EPSG:4262" -> (("Massawa", DatumMassawa)),
    "EPSG:4282" -> (("Pointe Noire", DatumPointeNoire)),
    "EPSG:4266" -> (("M'poraloko", DatumMporaloko)),
    "EPSG:4212" -> (("Barbados 1938", DatumBarbados38)),
    "EPSG:5451" -> (("Ocotepeque 1935", DatumOcotepeque)),
    "EPSG:4216" -> (("Bermuda 1957", DatumBermuda57)),
    "EPSG:4687" -> (("RGPF", DatumGrs80)),
    "EPSG:4749" -> (("RGNC91-93", DatumGrs80)),
    "EPSG:4242" -> (("JAD69", DatumJad69)),
    "EPSG:4758" -> (("JAD2001", DatumWgs84)),
    "EPSG:5546" -> (("PNG94", DatumGrs80)),
    "EPSG:4721" -> (("Fiji 1986", DatumFiji86)),
    // batch 14 (round 16): modern-GRS80 NAD83 realization aliases (HARN/
    // NSRS2007/2011 agree with NAD83 and WGS84 within this chain's class),
    // TWD97, and the Indian 1960 legacy frame for the new UTM block
    "EPSG:4152" -> (("NAD83(HARN)", DatumGrs80)),
    "EPSG:4759" -> (("NAD83(NSRS2007)", DatumGrs80)),
    "EPSG:6318" -> (("NAD83(2011)", DatumGrs80)),
    "EPSG:3824" -> (("TWD97", DatumGrs80)),
    "EPSG:4131" -> (("Indian 1960", DatumIndian1960)))

  /** WGS84 UTM zones resolve upstream of [[lookup]] (axis-order fast path);
   *  synthesis/introspection surfaces resolve them here the same way the
   *  zone families do. */
  private val Wgs84UtmRe = "EPSG:32([67])(0[1-9]|[1-5][0-9]|60)".r
  private def lookupOrUtm(code: String): Option[Crs] = code match {
    case Wgs84UtmRe(ns, z) =>
      Some(utmCrs(code, s"WGS 84 / UTM zone ${z.toInt}${if (ns == "6") "N" else "S"}",
        z.toInt, south = ns == "7", DatumWgs84))
    case _ => lookup(code)
  }

  // ------------------------------------------------- WKT1 synthesis (write)
  /** Datum identity for WKT1/PROJJSON synthesis. Numbers alone are enough
   *  for this repo's readers, but ArcGIS-style tools key datum
   *  transformations off the DATUM name, so a .prj that says
   *  "Unknown_based_on_GRS80" for NAD83 data loses real information.
   *  Resolution order: unambiguous Datum instances map directly; frames
   *  that share an ellipsoid-with-no-shift (GRS80 realizations) or an
   *  ellipsoid-with-different-shifts disambiguate on the CRS/GEOGCS name;
   *  fallback stays the ellipsoid-derived placeholder. */
  private def datumNameFor(crsName: String, d: Datum): String = {
    val byInstance: Option[String] =
      if (d == DatumWgs84) Some("WGS_1984")
      else if (d == DatumOsgb36) Some("OSGB_1936")
      else if (d == DatumTm75) Some("TM65")
      else if (d == DatumEd50) Some("European_Datum_1950")
      else if (d == DatumDhdn) Some("Deutsches_Hauptdreiecksnetz")
      else if (d == DatumMgi) Some("Militar_Geographische_Institut")
      else if (d == DatumMgi1901) Some("MGI_1901")
      else if (d == DatumGgrs87) Some("Greek_Geodetic_Reference_System_1987")
      else if (d == DatumNtf) Some("Nouvelle_Triangulation_Francaise")
      else if (d == DatumBd72) Some("Reseau_National_Belge_1972")
      else if (d == DatumPulkovo42) Some("Pulkovo_1942")
      else if (d == DatumNad27) Some("North_American_Datum_1927")
      else if (d == DatumSad69) Some("South_American_Datum_1969")
      else if (d == DatumAgd66) Some("Australian_Geodetic_Datum_1966")
      else if (d == DatumAgd84) Some("Australian_Geodetic_Datum_1984")
      else if (d == DatumHk80) Some("Hong_Kong_1980")
      else if (d == DatumIsrael93) Some("Israel_1993")
      else if (d == DatumLux30) Some("Luxembourg_1930")
      else if (d == DatumTimbalai) Some("Timbalai_1948")
      else if (d == DatumTrinidad) Some("Trinidad_1903")
      else if (d == DatumGuam) Some("Guam_1963")
      else if (d == DatumCh1903) Some("CH1903")
      else if (d == DatumSjtsk) Some("System_Jednotne_Trigonometricke_Site_Katastralni")
      else if (d == DatumHd72) Some("Hungarian_Datum_1972")
      else if (d == DatumAmersfoort) Some("Amersfoort")
      else if (d == DatumGda2020) Some("Geocentric_Datum_of_Australia_2020")
      else if (d == DatumIndian1954) Some("Indian_1954")
      else if (d == DatumIndian1975) Some("Indian_1975")
      else if (d == DatumKalianpur75) Some("Kalianpur_1975")
      else if (d == DatumKandawala) Some("Kandawala")
      else if (d == DatumVn2000) Some("Vietnam_2000")
      else if (d == DatumKertau) Some("Kertau_1968")
      else if (d == DatumBatavia) Some("Batavia")
      else if (d == DatumPrs92) Some("Philippine_Reference_System_1992")
      else if (d == DatumPsd93) Some("PDO_Survey_Datum_1993")
      else if (d == DatumQatar74) Some("Qatar_1974")
      else if (d == DatumNahrwan67) Some("Nahrwan_1967")
      else if (d == DatumArc1950) Some("Arc_1950")
      else if (d == DatumArc1960) Some("Arc_1960")
      else if (d == DatumAdindan) Some("Adindan")
      else if (d == DatumEgypt1907) Some("Egypt_1907")
      else if (d == DatumMinna) Some("Minna")
      else if (d == DatumCape) Some("Cape")
      else if (d == DatumNordSahara) Some("Nord_Sahara_1959")
      else if (d == DatumCarthage) Some("Carthage")
      else if (d == DatumMerchich) Some("Merchich")
      else if (d == DatumMonteMario) Some("Monte_Mario")
      else if (d == DatumTananarive) Some("Tananarive_1925")
      else if (d == DatumLeigon) Some("Leigon")
      else if (d == DatumLocodjo) Some("Locodjo_1965")
      else if (d == DatumAbidjan) Some("Abidjan_1987")
      else if (d == DatumDeirEzZor) Some("Deir_ez_Zor")
      else if (d == DatumAntigua43) Some("Antigua_1943")
      else if (d == DatumDominica45) Some("Dominica_1945")
      else if (d == DatumGrenada53) Some("Grenada_1953")
      else if (d == DatumMontserrat58) Some("Montserrat_1958")
      else if (d == DatumStKitts55) Some("St_Kitts_1955")
      else if (d == DatumStLucia55) Some("St_Lucia_1955")
      else if (d == DatumStVincent45) Some("St_Vincent_1945")
      else if (d == DatumJad69) Some("Jamaica_1969")
      else if (d == DatumFiji86) Some("Fiji_Geodetic_Datum_1986")
      else if (d == DatumMassawa) Some("Massawa")
      else if (d == DatumPointeNoire) Some("Pointe_Noire")
      else if (d == DatumMporaloko) Some("Mporaloko")
      else if (d == DatumBarbados38) Some("Barbados_1938")
      else if (d == DatumOcotepeque) Some("Ocotepeque_1935")
      else if (d == DatumBermuda57) Some("Bermuda_1957")
      else None
    byInstance.getOrElse {
      val n = crsName.toUpperCase
      val byFamily: Option[String] =
        if (n.contains("NAD83(HARN)")) Some("NAD83_High_Accuracy_Reference_Network")
        else if (n.contains("NAD83(2011)")) Some("NAD83_National_Spatial_Reference_System_2011")
        else if (n.contains("NAD83(CSRS)")) Some("NAD83_Canadian_Spatial_Reference_System")
        else if (n.contains("NAD83")) Some("North_American_Datum_1983")
        else if (n.contains("ETRS89") || n.contains("ETRS 89")) Some("European_Terrestrial_Reference_System_1989")
        else if (n.contains("GDA94") || n.contains("MGA")) Some("Geocentric_Datum_of_Australia_1994")
        else if (n.contains("GDA2020")) Some("GDA2020")
        else if (n.contains("NZGD2000") || n.contains("NZTM")) Some("New_Zealand_Geodetic_Datum_2000")
        else if (n.contains("JGD2000")) Some("Japanese_Geodetic_Datum_2000")
        else if (n.contains("JGD2011")) Some("Japanese_Geodetic_Datum_2011")
        else if (n.contains("RGF93")) Some("Reseau_Geodesique_Francais_1993")
        else if (n.contains("SIRGAS")) Some("SIRGAS_2000")
        else if (n.contains("CGCS2000")) Some("China_2000")
        else if (n.contains("SWEREF99")) Some("SWEREF99")
        else if (n.contains("KOREA 2000")) Some("Geocentric_datum_of_Korea")
        else if (n.contains("TUREF")) Some("Turkish_National_Reference_Frame")
        else if (n.contains("HTRS96")) Some("Croatian_Terrestrial_Reference_System")
        else if (n.contains("ITRF")) Some(n.takeWhile(_ != ' '))
        else None
      byFamily.getOrElse(wktNames(d.el)._2)
    }
  }

  /** Ellipsoid → (WKT1 spheroid name, datum name). Parsers read only the
   *  numbers; the names are for human readers and external tools. */
  private def wktNames(el: Ellipsoid): (String, String) =
    if (el == Wgs84) ("WGS 84", "WGS_1984")
    else if (el == Grs80) ("GRS 1980", "Unknown_based_on_GRS80")
    else if (el == Airy1830) ("Airy 1830", "OSGB_1936")
    else if (el == AiryModified) ("Airy Modified 1849", "Ireland_1965")
    else if (el == Intl1924) ("International 1924", "Unknown_based_on_International_1924")
    else if (el == Clarke1866) ("Clarke 1866", "North_American_Datum_1927")
    else if (el == Bessel1841) ("Bessel 1841", "Unknown_based_on_Bessel_1841")
    else if (el == Everest1967) ("Everest 1830 (1967 Definition)", "Timbalai_1948")
    else if (el == Grs67Mod) ("GRS 1967 Modified", "Australian_Geodetic_Datum")
    else if (el == Krass1940) ("Krassowsky 1940", "Pulkovo_1942")
    else if (el == Clarke1880Ign) ("Clarke 1880 (IGN)", "Nouvelle_Triangulation_Francaise")
    else if (el == Everest1937) ("Everest 1830 (1937 Adjustment)", "Indian_1954")
    else if (el == Everest1948) ("Everest 1830 Modified", "Kertau_1968")
    else if (el == Everest1975) ("Everest 1830 (1975 Definition)", "Kalianpur_1975")
    else if (el == Helmert1906) ("Helmert 1906", "Egypt_1907")
    else if (el == Clarke1880Rgs) ("Clarke 1880 (RGS)", "Unknown_based_on_Clarke_1880_RGS")
    else if (el == Clarke1880Arc) ("Clarke 1880 (Arc)", "Cape")
    else if (el == Sphere6370997)
      ("Clarke 1866 Authalic Sphere", "Not_specified_based_on_Clarke_1866_Authalic_Sphere")
    else if (el.invF.isInfinite) ("Sphere", "unnamed")
    else ("unnamed", "unnamed")

  private def wktNum(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString
  /** WKT1/PROJJSON spell a sphere as inverse flattening 0. */
  private def wktInvF(el: Ellipsoid): String =
    if (el.invF.isInfinite) "0" else el.invF.toString

  /** Synthesize WKT1 (the OGC/ESRI `.prj` dialect) for an authority code or
   *  `+proj=` string — the write-side CRS stamp (COPY `SRS` option →
   *  shapefile `.prj`, GeoPackage `gpkg_spatial_ref_sys.definition`).
   *  Derived from the entry's canonical `+proj=` record so the two public
   *  spellings cannot drift; GeoMeta.proj4FromWkt1 re-parses the result for
   *  every kernel its WKT1 reader covers (ProjRegistrySpec round-trip).
   *  None for CRSes with no proj4 record or grid-shift datums (WKT1 has no
   *  standard grid node). */
  def toWkt1(code: String): Option[String] = {
    val c = code.trim
    val up = c.toUpperCase
    def auth: String = if (up.startsWith("EPSG:")) s",AUTHORITY[\"EPSG\",\"${up.drop(5)}\"]" else ""
    def geogcs(name: String, d: Datum, trailer: String = "", family: String = ""): String = {
      val spn = wktNames(d.el)._1
      val dn = datumNameFor(if (family.nonEmpty) family else name, d)
      val tow = d.shift match {
        case Some(h) => s",TOWGS84[${h.tx},${h.ty},${h.tz},${h.rxAs},${h.ryAs},${h.rzAs},${h.dsPpm}]"
        case None => ""
      }
      // WKT1 convention: inverse flattening 0 denotes a sphere
      s"""GEOGCS["$name",DATUM["$dn",SPHEROID["$spn",${d.el.a},${wktInvF(d.el)}]$tow],""" +
        s"""PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]$trailer]"""
    }
    if (geographic.contains(up))
      return geographic.get(up).map { case (n, d) => geogcs(n, d, auth) }
    if (up == "EPSG:4326" || up == "OGC:CRS84" || up == "CRS84")
      return Some(geogcs("WGS 84", DatumWgs84, if (up == "EPSG:4326") ",AUTHORITY[\"EPSG\",\"4326\"]" else ""))
    val crs = lookupOrUtm(if (c.startsWith("+")) c else up).getOrElse(return None)
    if (crs.proj4 == null || crs.datum.grid.isDefined) return None
    val kv: Map[String, String] = crs.proj4.split("\\s+").iterator
      .filter(_.startsWith("+")).map(_.drop(1)).map { tok =>
        val i = tok.indexOf('=')
        if (i < 0) (tok, "") else (tok.take(i), tok.drop(i + 1))
      }.toMap
    if (kv.contains("nadgrids") || kv.contains("geoidgrids")) return None
    def n(k: String, dflt: Double = 0.0): Double = kv.get(k).map(_.toDouble).getOrElse(dflt)
    val unit = kv.get("to_meter").map(_.toDouble).getOrElse(kv.get("units") match {
      case Some("us-ft") => UsFoot
      case Some("ft") => 0.3048
      case _ => 1.0
    })
    val unitNode =
      if (unit == 1.0) """UNIT["metre",1]"""
      else if (unit == UsFoot) s"""UNIT["US survey foot",$UsFoot]"""
      else if (unit == 0.3048) """UNIT["foot",0.3048]"""
      else s"""UNIT["unknown",$unit]"""
    // false offsets in WKT1 are CRS-unit-denominated; +x_0/+y_0 are meters
    def pp(pairs: (String, Double)*): String =
      pairs.map { case (k, v) => s"""PARAMETER["$k",${wktNum(v)}]""" }.mkString(",")
    val k0 = n("k", n("k_0", 1.0))
    val method: Option[(String, String)] = kv("proj") match {
      case "tmerc" => Some(("Transverse_Mercator", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "scale_factor" -> k0, "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "utm" =>
        val z = n("zone").toInt
        Some(("Transverse_Mercator", pp(
          "latitude_of_origin" -> 0.0, "central_meridian" -> (z * 6 - 183).toDouble,
          "scale_factor" -> 0.9996, "false_easting" -> 500000.0,
          "false_northing" -> (if (kv.contains("south")) 10000000.0 else 0.0))))
      case "lcc" if kv.contains("lat_2") => Some(("Lambert_Conformal_Conic_2SP", pp(
        "standard_parallel_1" -> n("lat_1"), "standard_parallel_2" -> n("lat_2"),
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "lcc" => Some(("Lambert_Conformal_Conic_1SP", pp(
        "latitude_of_origin" -> n("lat_1", n("lat_0")), "central_meridian" -> n("lon_0"),
        "scale_factor" -> k0, "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "aea" => Some(("Albers_Conic_Equal_Area", pp(
        "standard_parallel_1" -> n("lat_1"), "standard_parallel_2" -> n("lat_2"),
        "latitude_of_center" -> n("lat_0"), "longitude_of_center" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "laea" => Some(("Lambert_Azimuthal_Equal_Area", pp(
        "latitude_of_center" -> n("lat_0"), "longitude_of_center" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "stere" if kv.contains("lat_ts") => Some(("Polar_Stereographic", pp(
        "latitude_of_origin" -> n("lat_0"), "standard_parallel_1" -> n("lat_ts"),
        "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "stere" => Some(("Polar_Stereographic", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "scale_factor" -> k0,
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "merc" if kv.contains("lat_ts") => Some(("Mercator_2SP", pp(
        "standard_parallel_1" -> n("lat_ts"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "merc" => Some(("Mercator_1SP", pp(
        "central_meridian" -> n("lon_0"), "scale_factor" -> k0,
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "cea" => Some(("Cylindrical_Equal_Area", pp(
        "standard_parallel_1" -> n("lat_ts"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "omerc" => Some((
        if (kv.contains("no_uoff")) "Hotine_Oblique_Mercator" else "Hotine_Oblique_Mercator_Azimuth_Center",
        pp("latitude_of_center" -> n("lat_0"), "longitude_of_center" -> n("lonc", n("lon_0")),
          "azimuth" -> n("alpha"), "rectified_grid_angle" -> n("gamma", n("alpha")),
          "scale_factor" -> k0,
          "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "somerc" => Some(("Hotine_Oblique_Mercator_Azimuth_Center", pp(
        "latitude_of_center" -> n("lat_0"), "longitude_of_center" -> n("lon_0"),
        "azimuth" -> 90.0, "rectified_grid_angle" -> 90.0, "scale_factor" -> k0,
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "krovak" => Some(("Krovak", pp(
        "latitude_of_center" -> n("lat_0"), "longitude_of_center" -> n("lon_0"),
        "azimuth" -> n("alpha", 30.28813972222222),
        "pseudo_standard_parallel_1" -> n("lat_1", 78.5), "scale_factor" -> k0,
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "sterea" => Some(("Oblique_Stereographic", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "scale_factor" -> k0, "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "cass" => Some(("Cassini_Soldner", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "nzmg" => Some(("New_Zealand_Map_Grid", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "poly" => Some(("Polyconic", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "eqc" => Some(("Equirectangular", pp(
        "standard_parallel_1" -> n("lat_ts"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "moll" => Some(("Mollweide", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "sinu" => Some(("Sinusoidal", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "robin" => Some(("Robinson", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "eqearth" => Some(("Equal_Earth", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "eck4" => Some(("Eckert_IV", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "mill" => Some(("Miller_Cylindrical", pp("central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "ortho" => Some(("Orthographic", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case "gnom" => Some(("Gnomonic", pp(
        "latitude_of_origin" -> n("lat_0"), "central_meridian" -> n("lon_0"),
        "false_easting" -> n("x_0") / unit, "false_northing" -> n("y_0") / unit)))
      case _ => None // longlat handled above; aeqd/guam has no WKT1 spelling here
    }
    method.map { case (projName, params) =>
      val axes = if (kv.get("axis").contains("wsu"))
        """,AXIS["Westing",WEST],AXIS["Southing",SOUTH]""" else ""
      val gcsName = "GCS_" + datumNameFor(crs.name, crs.datum)
      s"""PROJCS["${crs.name}",${geogcs(gcsName, crs.datum, family = crs.name)},""" +
        s"""PROJECTION["$projName"],$params,$unitNode$axes$auth]"""
    }
  }

  /** Synthesize PROJJSON (the PROJ project's published JSON CRS encoding —
   *  GeoParquet 1.1's `crs` member) for an authority code: EPSG method and
   *  parameter names over the entry's canonical `+proj=` record. A Helmert
   *  datum wraps the result in a BoundCRS whose transformation carries the
   *  EPSG 9606 position-vector parameters; GeoMeta.proj4FromProjjson reads
   *  both shapes back (CopySpec sweep). None for methods with no EPSG
   *  parameter mapping here, grid datums, and non-meter units. */
  def toProjjson(code: String): Option[String] = {
    val c = code.trim
    val up = c.toUpperCase
    def ident: String = if (up.startsWith("EPSG:")) s""","id":{"authority":"EPSG","code":${up.drop(5)}}""" else ""
    def geogJson(name: String, d: Datum, family: String = ""): String = {
      val spn = wktNames(d.el)._1
      val dn = datumNameFor(if (family.nonEmpty) family else name, d)
      s"""{"type":"GeographicCRS","name":"$name","datum":{"type":"GeodeticReferenceFrame","name":"$dn",""" +
        (if (d.el.invF.isInfinite) // PROJJSON spells a sphere via "radius"
           s""""ellipsoid":{"name":"$spn","radius":${d.el.a}}},"""
         else
           s""""ellipsoid":{"name":"$spn","semi_major_axis":${d.el.a},"inverse_flattening":${d.el.invF}}},""") +
        """"coordinate_system":{"subtype":"ellipsoidal","axis":[""" +
        """{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"},""" +
        """{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"}]}"""
    }
    def helmertParams(h: Helmert): String = Seq(
      ("X-axis translation", h.tx, "metre"), ("Y-axis translation", h.ty, "metre"),
      ("Z-axis translation", h.tz, "metre"), ("X-axis rotation", h.rxAs, "arc-second"),
      ("Y-axis rotation", h.ryAs, "arc-second"), ("Z-axis rotation", h.rzAs, "arc-second"),
      ("Scale difference", h.dsPpm, "parts per million")).map { case (nm, v, u) =>
      s"""{"name":"$nm","value":${wktNum(v)},"unit":"$u"}"""
    }.mkString(",")
    def boundJson(name: String, src: String, h: Helmert): String =
      s"""{"type":"BoundCRS","name":"$name","source_crs":$src,""" +
        s""""target_crs":${geogJson("WGS 84", DatumWgs84)}},""" +
        s""""transformation":{"name":"to WGS 84","method":{"name":"Position Vector transformation (geog2D domain)","id":{"authority":"EPSG","code":9606}},""" +
        s""""parameters":[${helmertParams(h)}]}$ident}"""
    // geographic codes with a Helmert datum wrap in the same BoundCRS shape
    // as projected ones — a bare GeographicCRS would silently drop the datum
    // shift on read-back (ADVICE r9)
    if (geographic.contains(up))
      return geographic.get(up).map { case (n, d) =>
        val src = geogJson(n, d) + ident + "}"
        d.shift match {
          case Some(h) => boundJson(n, src, h)
          case None => src
        }
      }
    if (up == "EPSG:4326" || up == "OGC:CRS84" || up == "CRS84")
      return Some(geogJson("WGS 84", DatumWgs84) +
        (if (up == "EPSG:4326") ""","id":{"authority":"EPSG","code":4326}""" else "") + "}")
    val crs = lookupOrUtm(if (c.startsWith("+")) c else up).getOrElse(return None)
    if (crs.proj4 == null || crs.datum.grid.isDefined) return None
    val kv: Map[String, String] = crs.proj4.split("\\s+").iterator
      .filter(_.startsWith("+")).map(_.drop(1)).map { tok =>
        val i = tok.indexOf('=')
        if (i < 0) (tok, "") else (tok.take(i), tok.drop(i + 1))
      }.toMap
    if (kv.contains("nadgrids") || kv.contains("geoidgrids")) return None
    if (kv.get("units").exists(_ != "m") || kv.contains("to_meter")) return None
    def n(k: String, dflt: Double = 0.0): Double = kv.get(k).map(_.toDouble).getOrElse(dflt)
    val k0 = n("k", n("k_0", 1.0))
    def par(pairs: (String, Double, String)*): String = pairs.map { case (nm, v, u) =>
      s"""{"name":"$nm","value":${wktNum(v)},"unit":"$u"}"""
    }.mkString(",")
    def natural(extra: (String, Double, String)*): String = par(Seq(
      ("Latitude of natural origin", n("lat_0"), "degree"),
      ("Longitude of natural origin", n("lon_0"), "degree")) ++ extra ++ Seq(
      ("False easting", n("x_0"), "metre"),
      ("False northing", n("y_0"), "metre")): _*)
    val sf = ("Scale factor at natural origin", k0, "unity")
    val method: Option[(String, Int, String)] = kv("proj") match {
      case "tmerc" => Some(("Transverse Mercator", 9807, natural(sf)))
      case "utm" =>
        val z = n("zone").toInt
        Some(("Transverse Mercator", 9807, par(
          ("Latitude of natural origin", 0.0, "degree"),
          ("Longitude of natural origin", (z * 6 - 183).toDouble, "degree"),
          ("Scale factor at natural origin", 0.9996, "unity"),
          ("False easting", 500000.0, "metre"),
          ("False northing", if (kv.contains("south")) 10000000.0 else 0.0, "metre"))))
      case "lcc" if kv.contains("lat_2") => Some(("Lambert Conic Conformal (2SP)", 9802, par(
        ("Latitude of false origin", n("lat_0"), "degree"),
        ("Longitude of false origin", n("lon_0"), "degree"),
        ("Latitude of 1st standard parallel", n("lat_1"), "degree"),
        ("Latitude of 2nd standard parallel", n("lat_2"), "degree"),
        ("Easting at false origin", n("x_0"), "metre"),
        ("Northing at false origin", n("y_0"), "metre"))))
      case "lcc" => Some(("Lambert Conic Conformal (1SP)", 9801, par(
        ("Latitude of natural origin", n("lat_1", n("lat_0")), "degree"),
        ("Longitude of natural origin", n("lon_0"), "degree"), sf,
        ("False easting", n("x_0"), "metre"),
        ("False northing", n("y_0"), "metre"))))
      case "aea" => Some(("Albers Equal Area", 9822, par(
        ("Latitude of false origin", n("lat_0"), "degree"),
        ("Longitude of false origin", n("lon_0"), "degree"),
        ("Latitude of 1st standard parallel", n("lat_1"), "degree"),
        ("Latitude of 2nd standard parallel", n("lat_2"), "degree"),
        ("Easting at false origin", n("x_0"), "metre"),
        ("Northing at false origin", n("y_0"), "metre"))))
      case "laea" => Some(("Lambert Azimuthal Equal Area", 9820, natural()))
      case "stere" if kv.contains("lat_ts") => Some(("Polar Stereographic (variant B)", 9829, par(
        ("Latitude of standard parallel", n("lat_ts"), "degree"),
        ("Longitude of origin", n("lon_0"), "degree"),
        ("False easting", n("x_0"), "metre"),
        ("False northing", n("y_0"), "metre"))))
      case "stere" => Some(("Polar Stereographic (variant A)", 9810, natural(sf)))
      case "merc" if kv.contains("lat_ts") => Some(("Mercator (variant B)", 9805, par(
        ("Latitude of 1st standard parallel", n("lat_ts"), "degree"),
        ("Longitude of natural origin", n("lon_0"), "degree"),
        ("False easting", n("x_0"), "metre"),
        ("False northing", n("y_0"), "metre"))))
      case "merc" => Some(("Mercator (variant A)", 9804, natural(sf)))
      case "cea" => Some(("Lambert Cylindrical Equal Area", 9835, par(
        ("Latitude of 1st standard parallel", n("lat_ts"), "degree"),
        ("Longitude of natural origin", n("lon_0"), "degree"),
        ("False easting", n("x_0"), "metre"),
        ("False northing", n("y_0"), "metre"))))
      case "nzmg" => Some(("New Zealand Map Grid", 9811, natural()))
      case "eqearth" => Some(("Equal Earth", 1078, par(
        ("Longitude of natural origin", n("lon_0"), "degree"),
        ("False easting", n("x_0"), "metre"),
        ("False northing", n("y_0"), "metre"))))
      case _ => None // methods beyond the reader's PROJJSON ladder
    }
    method.map { case (mName, mCode, params) =>
      val proj =
        s"""{"type":"ProjectedCRS","name":"${crs.name}","base_crs":${geogJson("GCS_" + datumNameFor(crs.name, crs.datum), crs.datum, family = crs.name)}},""" +
          s""""conversion":{"name":"unnamed","method":{"name":"$mName","id":{"authority":"EPSG","code":$mCode}},""" +
          s""""parameters":[$params]},"coordinate_system":{"subtype":"Cartesian","axis":[""" +
          """{"name":"Easting","abbreviation":"E","direction":"east","unit":"metre"},""" +
          """{"name":"Northing","abbreviation":"N","direction":"north","unit":"metre"}]}""" + ident + "}"
      crs.datum.shift match {
        case Some(h) => boundJson(crs.name, proj, h)
        case None => proj
      }
    }
  }

  /** ST_Read_Meta enrichment: human name + equivalent `+proj=` string for a
   *  recognized authority code ("EPSG:4326"-style), covering projected
   *  registry/zone-family codes AND geographic codes. */
  def describe(code: String): Option[(String, String)] = {
    val c = code.trim.toUpperCase
    lookupOrUtm(c).collect { case crs if crs.proj4 != null => (crs.name, crs.proj4) }
      .orElse(geographic.get(c).map { case (name, d) =>
        (name, s"+proj=longlat ${datumTags(d)} +no_defs")
      })
      .orElse(c match {
        case "EPSG:4326" => Some(("WGS 84", "+proj=longlat +datum=WGS84 +no_defs"))
        case "OGC:CRS84" | "CRS84" => Some(("WGS 84 longitude-latitude", "+proj=longlat +datum=WGS84 +no_defs"))
        case "EPSG:3857" | "EPSG:900913" | "ESRI:102100" | "EPSG:102100" => Some(("WGS 84 / Pseudo-Mercator",
          "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +no_defs"))
        case _ => None
      })
  }

  /** All codes the registry + zone families accept (for ST_List_Proj_CRS). */
  def allCodes: Seq[(String, String)] = {
    val families = Seq(
      (26901 to 26923).map(c => s"EPSG:$c"),
      (28348 to 28358).map(c => s"EPSG:$c"),
      (7846 to 7859).map(c => s"EPSG:$c"),
      (31965 to 31985).map(c => s"EPSG:$c"),
      (23028 to 23038).map(c => s"EPSG:$c"),
      (25828 to 25838).map(c => s"EPSG:$c"),
      (6330 to 6348).map(c => s"EPSG:$c"),
      (28402 to 28432).map(c => s"EPSG:$c"),
      (22171 to 22177).map(c => s"EPSG:$c"),
      (22181 to 22187).map(c => s"EPSG:$c"),
      (26703 to 26722).map(c => s"EPSG:$c"),
      (20249 to 20256).map(c => s"EPSG:$c"),
      (20349 to 20356).map(c => s"EPSG:$c"),
      (4491 to 4554).map(c => s"EPSG:$c"),
      (32201 to 32260).map(c => s"EPSG:$c"),
      (32301 to 32360).map(c => s"EPSG:$c"),
      (3038 to 3051).map(c => s"EPSG:$c"),
      (5343 to 5349).map(c => s"EPSG:$c")).flatten
    (registry.keys.toSeq.map(c => c -> registry(c).name) ++
      families.flatMap(c => lookup(c).map(c -> _.name)) ++
      geographic.map { case (c, (n, _)) => c -> s"$n (geographic)" }).sortBy(_._1)
  }
}
