package graft.geom

/**
 * Transverse Mercator (UTM) on WGS84 via the Krüger series in Karney's
 * formulation ("Transverse Mercator with an accuracy of a few nanometers",
 * 2011 — published, public formulas; 6th-order alpha/beta coefficients).
 * Forward + inverse are sub-millimeter over a UTM zone.
 */
object Tm {

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val n = f / (2.0 - f)
  private val k0 = 0.9996
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n

  private val A = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)

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

  /** lon/lat degrees → UTM easting/northing for the given zone + hemisphere. */
  def forward(lonDeg: Double, latDeg: Double, zone: Int, north: Boolean): (Double, Double) = {
    val lon0 = (zone * 6 - 183).toDouble
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - lon0)
    val sinPhi = math.sin(phi)
    val t = math.sinh(atanh(sinPhi) - 2 * math.sqrt(n) / (1 + n) * atanh(2 * math.sqrt(n) / (1 + n) * sinPhi))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = atanh(math.sin(lam) / math.sqrt(1 + t * t))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    val e = 500000.0 + k0 * A * eta
    val nn = (if (north) 0.0 else 10000000.0) + k0 * A * xi
    (e, nn)
  }

  /** UTM easting/northing → lon/lat degrees. */
  def inverse(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) = {
    val lon0 = (zone * 6 - 183).toDouble
    val xi = (northing - (if (north) 0.0 else 10000000.0)) / (k0 * A)
    val eta = (easting - 500000.0) / (k0 * A)
    var xiP = xi
    var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 6) {
      phi += delta(j - 1) * math.sin(2 * j * chi)
      j += 1
    }
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    (lon0 + math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
}
