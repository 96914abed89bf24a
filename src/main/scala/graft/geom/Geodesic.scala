package graft.geom

/**
 * Geodesic problems on an ellipsoid of revolution after Karney, "Algorithms
 * for geodesics", J. Geodesy 87(1) 2013 (published, public formulas) — the
 * same algorithm behind GeographicLib, which the reference calls in
 * st_distance_spheroid.cpp. Replaces Vincenty's iteration, which famously
 * fails to converge for near-antipodal pairs; this solver handles every pair.
 *
 * The inverse solvers work on the auxiliary sphere: λ12(α1) = λ12 is solved
 * by a grid scan over α1 ∈ (0, π) followed by bisection on every sign-change
 * bracket; near conjugate points (the antipodal region) λ12(α1) is not
 * monotone and several azimuths solve the equation — each root is a geodesic
 * joining the points, so the minimum s12 over the roots IS the distance.
 * This trades Karney's astroid starting guess + Newton polish for a few
 * hundred cheap series evaluations and unconditional convergence. Series are
 * carried to O(ε⁶) (sub-millimeter).
 *
 * Round 8 adds the DIRECT problem (Karney §5: given p1, α1, s12 → p2, α2;
 * the distance integral is inverted by Newton on σ using the same C1
 * series) and `inverseFull`, which returns (s12, α1, α2) — the pair that
 * powers the general geodesic azimuthal-equidistant projection
 * (`+proj=aeqd`, Proj.scala). Both are parametrized by (a, 1/f) so the
 * aeqd kernel works on any registry ellipsoid; the historical WGS84-only
 * distance entry point is kept as `Geodesic.inverse`.
 */
final class GeodesicCalc(val eqA: Double, val invF: Double) {

  private val A = eqA
  private val F = 1.0 / invF
  private val B = A * (1 - F)
  private val N = F / (2 - F)
  private val Ep2 = F * (2 - F) / ((1 - F) * (1 - F)) // e'²
  private val Tiny = 1e-12

  private def a1(eps: Double): Double = {
    val e2 = eps * eps
    (1 + e2 / 4 + e2 * e2 / 64 + e2 * e2 * e2 / 256) / (1 - eps)
  }
  /** C1 coefficients l=1..6 (Karney eq. 18) */
  private def c1(eps: Double): Array[Double] = {
    val e = eps; val e2 = e * e; val e3 = e2 * e; val e4 = e3 * e; val e5 = e4 * e; val e6 = e5 * e
    Array(
      -e / 2 + 3 * e3 / 16 - e5 / 32,
      -e2 / 16 + e4 / 32 - 9 * e6 / 2048,
      -e3 / 48 + 3 * e5 / 256,
      -5 * e4 / 512 + 3 * e6 / 512,
      -7 * e5 / 1280,
      -7 * e6 / 2048)
  }
  /** A3 (Karney eq. 24), expansion in ε with n fixed */
  private def a3(eps: Double): Double =
    1 - (0.5 - 0.5 * N) * eps -
      (0.25 + N / 8 - 3 * N * N / 8) * eps * eps -
      (1.0 / 16 + 3 * N / 16 + N * N / 16) * eps * eps * eps -
      (3.0 / 64 + N / 32) * math.pow(eps, 4) -
      3.0 / 128 * math.pow(eps, 5)
  /** C3 coefficients l=1..5 (Karney eq. 25) */
  private def c3(eps: Double): Array[Double] = {
    val e = eps; val e2 = e * e; val e3 = e2 * e; val e4 = e3 * e; val e5 = e4 * e
    Array(
      (0.25 - N / 4) * e + (0.125 - N * N / 8) * e2 + (3.0 / 64 + 3 * N / 64 - N * N / 64) * e3 +
        (5.0 / 128 + N / 64) * e4 + 3.0 / 128 * e5,
      (1.0 / 16 - 3 * N / 32 + N * N / 32) * e2 + (3.0 / 64 - N / 32 - 3 * N * N / 64) * e3 +
        (3.0 / 128 + N / 128) * e4 + 5.0 / 256 * e5,
      (5.0 / 192 - 3 * N / 64 + 5 * N * N / 192) * e3 + (3.0 / 128 - 5 * N / 192) * e4 + 7.0 / 512 * e5,
      (7.0 / 512 - 7 * N / 256) * e4 + 7.0 / 512 * e5,
      21.0 / 2560 * e5)
  }

  private def sinSeries(c: Array[Double], ssig: Double, csig: Double): Double = {
    // Σ c(l) sin(2 l σ) via Clenshaw would be nicer; direct is fine at order 6
    var s = 0.0
    val s2 = 2 * ssig * csig          // sin 2σ
    val c2 = (csig - ssig) * (csig + ssig) // cos 2σ
    var sk = s2; var ck = c2
    var l = 0
    while (l < c.length) {
      s += c(l) * sk
      val sn = sk * c2 + ck * s2
      ck = ck * c2 - sk * s2
      sk = sn
      l += 1
    }
    s
  }

  /** d/dσ Σ c(l) sin(2 l σ) = Σ 2 l c(l) cos(2 l σ) — Newton slope for the
   *  direct problem's distance inversion. */
  private def sinSeriesDeriv(c: Array[Double], ssig: Double, csig: Double): Double = {
    var s = 0.0
    val s2 = 2 * ssig * csig
    val c2 = (csig - ssig) * (csig + ssig)
    var sk = s2; var ck = c2
    var l = 0
    while (l < c.length) {
      s += 2 * (l + 1) * c(l) * ck
      val sn = sk * c2 + ck * s2
      ck = ck * c2 - sk * s2
      sk = sn
      l += 1
    }
    s
  }

  /** meridian arc from equator to reduced latitude β (σ = β on a meridian) */
  private def meridianArc(sbet: Double, cbet: Double): Double = {
    val eps = Ep2 / (2 * (1 + math.sqrt(1 + Ep2)) + Ep2)
    B * (a1(eps) * (math.atan2(sbet, cbet) + sinSeries(c1(eps), sbet, cbet)))
  }

  /** sin/cos of the reduced latitude for a geographic latitude in degrees;
   *  cβ floored at Tiny so poles stay well-conditioned. */
  private def betaOf(lat: Double): (Double, Double) = {
    val phi = math.toRadians(math.max(-90.0, math.min(90.0, lat)))
    val sb = (1 - F) * math.sin(phi); val cb = math.cos(phi)
    val h = math.hypot(sb, cb)
    (sb / h, math.max(Tiny, cb / h))
  }

  /** geodesic distance in meters between (lat1,lon1) and (lat2,lon2) degrees */
  def inverse(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    // λ12 ∈ [0, π]
    var lon12 = math.abs(math.IEEEremainder(lon2 - lon1, 360.0))
    if (lon12 > 180) lon12 = 360 - lon12
    var lam12 = math.toRadians(lon12)

    // reduced latitudes, canonical arrangement: |β1| ≥ |β2|, β1 ≤ 0
    var (sbet1, cbet1) = betaOf(lat1)
    var (sbet2, cbet2) = betaOf(lat2)
    if (cbet1 > cbet2 || (cbet1 == cbet2 && math.abs(sbet1) < math.abs(sbet2))) {
      val t1 = sbet1; sbet1 = sbet2; sbet2 = t1
      val t2 = cbet1; cbet1 = cbet2; cbet2 = t2
    }
    if (sbet1 > 0) { sbet1 = -sbet1; sbet2 = -sbet2 }

    // equatorial pair: along the equator while the arc is ≤ (1-f)π
    if (math.abs(sbet1) < Tiny && math.abs(sbet2) < Tiny) {
      if (lam12 <= (1 - F) * math.Pi) return A * lam12
      // antipodal-region equatorial pair: geodesic leaves the equator;
      // σ1=0, σ2=π ⇒ λ12 = π(1 − f sinα0 A3(ε)); solve for sinα0
      var salp0 = 0.0
      var i = 0
      while (i < 20) {
        val calp0sq = 1 - salp0 * salp0
        val k2 = calp0sq * Ep2
        val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
        val next = (math.Pi - lam12) / (F * math.Pi * a3(eps))
        if (math.abs(next - salp0) < 1e-15) { salp0 = next; i = 20 } else { salp0 = next; i += 1 }
      }
      val k2 = (1 - salp0 * salp0) * Ep2
      val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
      return B * a1(eps) * math.Pi
    }

    // meridional pair (λ12 = 0): direct arc difference
    if (lam12 < Tiny)
      return math.abs(meridianArc(sbet2, cbet2) - meridianArc(sbet1, cbet1))
    // λ12 = π exactly: nudge inside the bracket (changes s12 by ~1e-5 m)
    if (lam12 > math.Pi - Tiny) lam12 = math.Pi - Tiny

    solveCanonical(sbet1, cbet1, sbet2, cbet2, lam12)._1
  }

  /** λ12 and s12 on the auxiliary sphere for a trial azimuth α1, plus the
   *  forward-azimuth components at p2 (canonical frame: salp1 ≥ 0 ⇒
   *  salp2 ≥ 0, calp2 ≥ 0). */
  private def evalCanonical(sbet1: Double, cbet1: Double, sbet2: Double, cbet2: Double,
                            salp1: Double, calp1: Double): (Double, Double, Double, Double) = {
    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1; var csig1 = cbet1 * calp1
    val h1 = math.hypot(ssig1, csig1); ssig1 /= h1; csig1 /= h1
    val calp2 = math.sqrt(math.max(0, (calp1 * cbet1) * (calp1 * cbet1) +
      (cbet2 - cbet1) * (cbet2 + cbet1))) / cbet2
    val salp2 = salp0 / cbet2
    var ssig2 = sbet2; var csig2 = cbet2 * calp2
    val h2 = math.hypot(ssig2, csig2); ssig2 /= h2; csig2 /= h2
    val sig12 = math.atan2(math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
      csig1 * csig2 + ssig1 * ssig2)
    val somg1 = salp0 * ssig1; val comg1 = csig1
    val somg2 = salp0 * ssig2; val comg2 = csig2
    val omg12 = math.atan2(math.max(0.0, comg1 * somg2 - somg1 * comg2),
      comg1 * comg2 + somg1 * somg2)
    val k2 = calp0 * calp0 * Ep2
    val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
    val cc3 = c3(eps)
    val lam = omg12 - F * salp0 * a3(eps) *
      (sig12 + (sinSeries(cc3, ssig2, csig2) - sinSeries(cc3, ssig1, csig1)))
    val cc1 = c1(eps)
    val s = B * a1(eps) *
      (sig12 + (sinSeries(cc1, ssig2, csig2) - sinSeries(cc1, ssig1, csig1)))
    (lam, s, salp2, calp2)
  }

  /** Canonical-frame inverse: grid scan + bisection for the shortest root.
   *  Returns (s12, salp1, calp1, salp2, calp2). */
  private def solveCanonical(sbet1: Double, cbet1: Double, sbet2: Double, cbet2: Double,
                             lam12: Double): (Double, Double, Double, Double, Double) = {
    def lamAt(alp: Double): Double =
      evalCanonical(sbet1, cbet1, sbet2, cbet2, math.sin(alp), math.cos(alp))._1

    val Grid = 256
    var best = Double.MaxValue
    var bestAlp = math.Pi - Tiny
    var prevA = Tiny
    var prevG = lamAt(prevA) - lam12
    var k = 1
    while (k <= Grid) {
      val a = Tiny + (math.Pi - 2 * Tiny) * k / Grid
      val g = lamAt(a) - lam12
      if ((prevG <= 0 && g >= 0) || (prevG >= 0 && g <= 0)) {
        var lo = prevA; var hi = a
        var gLo = prevG
        var i = 0
        while (i < 60) {
          val mid = (lo + hi) / 2
          val gm = lamAt(mid) - lam12
          if ((gLo <= 0 && gm <= 0) || (gLo >= 0 && gm >= 0)) { lo = mid; gLo = gm } else hi = mid
          i += 1
        }
        val alp = (lo + hi) / 2
        val s = evalCanonical(sbet1, cbet1, sbet2, cbet2, math.sin(alp), math.cos(alp))._2
        if (s < best) { best = s; bestAlp = alp }
      }
      prevA = a; prevG = g
      k += 1
    }
    if (best == Double.MaxValue)
      // no sign change found (flat λ12 below target everywhere except the
      // π end): the geodesic is the near-meridional one at the top bracket
      bestAlp = math.Pi - Tiny
    val (_, s, salp2, calp2) =
      evalCanonical(sbet1, cbet1, sbet2, cbet2, math.sin(bestAlp), math.cos(bestAlp))
    (s, math.sin(bestAlp), math.cos(bestAlp), salp2, calp2)
  }

  /** Full inverse problem: (s12 meters, forward azimuth at p1, forward
   *  azimuth at p2), azimuths in degrees clockwise from north in (−180,180].
   *  Canonicalization bookkeeping follows GeographicLib's Inverse: solve
   *  with |β1| ≥ |β2|, β1 ≤ 0, λ12 ∈ [0, π], then undo the point swap /
   *  latitude flip / longitude sign on the azimuth components. */
  def inverseFull(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double, Double) = {
    if (lat1 == lat2 && lon1 == lon2) return (0.0, 0.0, 0.0)
    var lon12 = math.IEEEremainder(lon2 - lon1, 360.0)
    if (lon12 == -180.0) lon12 = 180.0
    var lonsign = if (lon12 >= 0) 1.0 else -1.0
    lon12 *= lonsign

    var la1 = lat1; var la2 = lat2
    val swapp = if (math.abs(la1) < math.abs(la2)) -1.0 else 1.0
    if (swapp < 0) { lonsign = -lonsign; val t = la1; la1 = la2; la2 = t }
    val latsign = if (la1 < 0) 1.0 else -1.0
    la1 *= latsign; la2 *= latsign

    val (sbet1, cbet1) = betaOf(la1)
    val (sbet2, cbet2) = betaOf(la2)
    var lam12 = math.toRadians(lon12)

    var s12 = 0.0
    var salp1 = 0.0; var calp1 = 0.0; var salp2 = 0.0; var calp2 = 0.0
    if (math.abs(sbet1) < Tiny && math.abs(sbet2) < Tiny && lam12 <= (1 - F) * math.Pi) {
      // equatorial geodesic, heading due east in the canonical frame
      s12 = A * lam12
      salp1 = 1.0; calp1 = 0.0; salp2 = 1.0; calp2 = 0.0
    } else if (lam12 < Tiny) {
      // meridional: canonical frame runs south→north
      s12 = math.abs(meridianArc(sbet2, cbet2) - meridianArc(sbet1, cbet1))
      salp1 = 0.0; calp1 = 1.0; salp2 = 0.0; calp2 = 1.0
    } else {
      if (lam12 > math.Pi - Tiny) lam12 = math.Pi - Tiny
      val r = solveCanonical(sbet1, cbet1, sbet2, cbet2, lam12)
      s12 = r._1; salp1 = r._2; calp1 = r._3; salp2 = r._4; calp2 = r._5
    }

    if (swapp < 0) {
      var t = salp1; salp1 = salp2; salp2 = t
      t = calp1; calp1 = calp2; calp2 = t
    }
    salp1 *= swapp * lonsign; calp1 *= swapp * latsign
    salp2 *= swapp * lonsign; calp2 *= swapp * latsign
    (s12, math.toDegrees(math.atan2(salp1, calp1)), math.toDegrees(math.atan2(salp2, calp2)))
  }

  /** Direct problem (Karney §5): from (lat1, lon1) with forward azimuth
   *  azi1 (degrees clockwise from north) travel s12 meters along the
   *  geodesic; returns (lat2, lon2, azi2). The distance→σ inversion uses
   *  Newton on σ with the C1 series slope (4 iterations reach machine
   *  precision; no C1′ reverted series needed). */
  def direct(lat1: Double, lon1: Double, azi1: Double, s12: Double): (Double, Double, Double) = {
    val (sbet1, cbet1) = betaOf(lat1)
    val alp1 = math.toRadians(azi1)
    val salp1 = math.sin(alp1); val calp1 = math.cos(alp1)

    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1
    var csig1 = if (sbet1 == 0 && calp1 == 0) 1.0 else cbet1 * calp1
    val h1 = math.hypot(ssig1, csig1); ssig1 /= h1; csig1 /= h1
    val sig1 = math.atan2(ssig1, csig1)

    val k2 = calp0 * calp0 * Ep2
    val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
    val cc1 = c1(eps)
    val aa1 = a1(eps)
    // τ2 solves A1 (σ2 + B1(σ2)) = A1 (σ1 + B1(σ1)) + s12/b
    val tau = sig1 + sinSeries(cc1, ssig1, csig1) + s12 / (B * aa1)
    var sig2 = tau
    var i = 0
    while (i < 6) {
      val ss = math.sin(sig2); val cs = math.cos(sig2)
      val f = sig2 + sinSeries(cc1, ss, cs) - tau
      val fp = 1 + sinSeriesDeriv(cc1, ss, cs)
      sig2 -= f / fp
      i += 1
    }
    val ssig2 = math.sin(sig2); val csig2 = math.cos(sig2)

    val sbet2 = calp0 * ssig2
    val cbet2 = math.max(Tiny, math.hypot(salp0, calp0 * csig2))
    val salp2 = salp0; val calp2 = calp0 * csig2

    val omg1 = math.atan2(salp0 * ssig1, csig1)
    val omg2 = math.atan2(salp0 * ssig2, csig2)
    // ω accumulates continuously with σ: unwrap ω2 to the branch nearest
    // ω1 + (σ2 − σ1) so multi-wrap distances keep λ12 continuous
    val dSig = sig2 - sig1
    val omg2Unwrapped = omg1 + dSig +
      math.IEEEremainder(omg2 - omg1 - dSig, 2 * math.Pi)
    val cc3 = c3(eps)
    val lam12 = (omg2Unwrapped - omg1) - F * salp0 * a3(eps) *
      (dSig + (sinSeries(cc3, ssig2, csig2) - sinSeries(cc3, ssig1, csig1)))

    var lon2 = lon1 + math.toDegrees(lam12)
    lon2 = math.IEEEremainder(lon2, 360.0)
    if (lon2 == -180.0) lon2 = 180.0
    val lat2 = math.toDegrees(math.atan2(sbet2, (1 - F) * cbet2))
    (lat2, lon2, math.toDegrees(math.atan2(salp2, calp2)))
  }
}

object Geodesic {
  /** WGS84 solver — the engine's *_Spheroid functions are WGS84-fixed, same
   *  as the reference (geographiclib module hardcodes the WGS84 constants). */
  val Wgs84: GeodesicCalc = new GeodesicCalc(6378137.0, 298.257223563)

  private val cache = new java.util.concurrent.ConcurrentHashMap[(Double, Double), GeodesicCalc]()
  def forEllipsoid(a: Double, invF: Double): GeodesicCalc =
    if (a == Wgs84.eqA && invF == Wgs84.invF) Wgs84
    else cache.computeIfAbsent((a, invF), { case (aa, ff) => new GeodesicCalc(aa, ff) })

  /** geodesic distance in meters between two WGS84 points (degrees) */
  def inverse(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Wgs84.inverse(lat1, lon1, lat2, lon2)
}
