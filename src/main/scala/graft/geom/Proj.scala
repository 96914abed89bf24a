package graft.geom

/**
 * Projected-CRS registry beyond Mercator/UTM (reference: proj/functions.cpp
 * delegates to PROJ's full database; we embed the projection math for the
 * widely-used conic/azimuthal families instead, from the published formulas in
 * Snyder, "Map Projections — A Working Manual" (USGS PP 1395) and EPSG
 * Guidance Note 7-2).
 *
 * All registered CRSes sit on GRS80/WGS84-equivalent datums (RGF93, ETRS89,
 * NAD83, GDA94 — identical to WGS84 at the sub-meter level by definition), so
 * no datum shift step is needed; CRSes on legacy datums (e.g. OSGB36) are
 * deliberately not registered rather than silently wrong.
 */
object Proj {

  /** forward: lon/lat degrees → projected x/y; inverse: the reverse. */
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

  // common helpers (Snyder 14-15, 15-9, 3-12)
  private def mFn(el: Ellipsoid, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - el.e2 * math.sin(phi) * math.sin(phi))
  private def tFn(el: Ellipsoid, phi: Double): Double = {
    val esin = el.e * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - esin) / (1 + esin), el.e / 2)
  }
  private def qFn(el: Ellipsoid, phi: Double): Double = {
    val sinPhi = math.sin(phi)
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
      val theta = math.atan2(dx, dy)
      val t = math.pow(r / (el.a * bigF), 1 / n)
      (math.toDegrees(lamF + theta / n), math.toDegrees(phiFromT(el, t)))
    }
  }

  /** Albers Equal-Area Conic (EPSG method 9822 / Snyder 14-1..14-12). */
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
      val theta = math.atan2(dx, dy)
      val q = (c - rho * rho * n * n / (el.a * el.a)) / n
      (math.toDegrees(lam0 + theta / n), math.toDegrees(phiFromQ(el, q)))
    }
  }

  /** Lambert Azimuthal Equal-Area, oblique aspect (EPSG method 9820 /
   *  Snyder 24-2..24-14 via authalic latitudes). */
  final class Laea(el: Ellipsoid, phi0Deg: Double, lam0Deg: Double,
                   fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(phi0Deg)
    private val lam0 = math.toRadians(lam0Deg)
    private val qp = qFn(el, math.Pi / 2)
    private val rq = el.a * math.sqrt(qp / 2)
    private val beta0 = math.asin(qFn(el, phi0) / qp)
    private val d = el.a * mFn(el, phi0) / (rq * math.cos(beta0))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg)
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
   *  9829 / Snyder 21-x ellipsoidal). `north`: pole aspect. In the north
   *  aspect y decreases away from the pole along λ0; in the south aspect it
   *  increases (EPSG Guidance 7-2). */
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

  /** EPSG registry entries (public parameter values from the EPSG dataset). */
  lazy val registry: Map[String, Projection] = Map(
    // RGF93 / Lambert-93 (France)
    "EPSG:2154" -> new Lcc2SP(Grs80, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
    // NAD83 / Conus Albers (continental US)
    "EPSG:5070" -> new Albers(Grs80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    // GDA94 / Australian Albers
    "EPSG:3577" -> new Albers(Grs80, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
    // ETRS89-extended / LAEA Europe
    "EPSG:3035" -> new Laea(Grs80, 52.0, 10.0, 4321000.0, 3210000.0),
    // WGS84 / NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413" -> new PolarStereo(Wgs84, 70.0, -45.0, 0.0, 0.0, north = true),
    // WGS84 / Antarctic Polar Stereographic
    "EPSG:3031" -> new PolarStereo(Wgs84, -71.0, 0.0, 0.0, 0.0, north = false))
}
