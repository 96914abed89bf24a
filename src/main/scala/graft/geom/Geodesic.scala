package graft.geom

/**
 * Geodesic inverse problem on the WGS84 ellipsoid after Karney, "Algorithms
 * for geodesics", J. Geodesy 87(1) 2013 (published, public formulas) — the
 * same algorithm behind GeographicLib, which the reference calls in
 * st_distance_spheroid.cpp. Replaces Vincenty's iteration, which famously
 * fails to converge for near-antipodal pairs; this solver handles every pair.
 *
 * Only the distance s12 is computed (the engine's *_Spheroid functions need
 * nothing else). The auxiliary-sphere equation λ12(α1) = λ12 is solved by a
 * grid scan over α1 ∈ (0, π) followed by bisection on every sign-change
 * bracket; near conjugate points (the antipodal region) λ12(α1) is not
 * monotone and several azimuths solve the equation — each root is a geodesic
 * joining the points, so the minimum s12 over the roots IS the distance.
 * This trades Karney's astroid starting guess + Newton polish for a few
 * hundred cheap series evaluations and unconditional convergence. Series are
 * carried to O(ε⁶) (sub-millimeter).
 */
object Geodesic {

  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
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

  /** meridian arc from equator to reduced latitude β (σ = β on a meridian) */
  private def meridianArc(sbet: Double, cbet: Double): Double = {
    val eps = Ep2 / (2 * (1 + math.sqrt(1 + Ep2)) + Ep2)
    B * (a1(eps) * (math.atan2(sbet, cbet) + sinSeries(c1(eps), sbet, cbet)))
  }

  /** geodesic distance in meters between (lat1,lon1) and (lat2,lon2) degrees */
  def inverse(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    // λ12 ∈ [0, π]
    var lon12 = math.abs(math.IEEEremainder(lon2 - lon1, 360.0))
    if (lon12 > 180) lon12 = 360 - lon12
    var lam12 = math.toRadians(lon12)

    // reduced latitudes, canonical arrangement: |β1| ≥ |β2|, β1 ≤ 0
    def beta(lat: Double): (Double, Double) = {
      val phi = math.toRadians(math.max(-90.0, math.min(90.0, lat)))
      val sb = (1 - F) * math.sin(phi); val cb = math.cos(phi)
      val h = math.hypot(sb, cb)
      (sb / h, math.max(Tiny, cb / h))
    }
    var (sbet1, cbet1) = beta(lat1)
    var (sbet2, cbet2) = beta(lat2)
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

    // λ12 and s12 on the auxiliary sphere for a trial azimuth α1
    def eval(salp1: Double, calp1: Double): (Double, Double) = {
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
      (lam, s)
    }

    def lamAt(alp: Double): Double = eval(math.sin(alp), math.cos(alp))._1

    // grid scan: collect every bracket where g(α1) = λ12(α1) − λ12 changes
    // sign, refine each by bisection, keep the shortest root
    val Grid = 256
    var best = Double.MaxValue
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
        val s = eval(math.sin((lo + hi) / 2), math.cos((lo + hi) / 2))._2
        if (s < best) best = s
      }
      prevA = a; prevG = g
      k += 1
    }
    if (best == Double.MaxValue) {
      // no sign change found (flat λ12 below target everywhere except the
      // π end): the geodesic is the near-meridional one at the top bracket
      best = eval(math.sin(math.Pi - Tiny), math.cos(math.Pi - Tiny))._2
    }
    best
  }
}
