package graft.core

/**
 * Pure spherical-geometry math used across the engine (driver-side cell
 * logic, Catalyst expressions, and tests).
 *
 * Semantics mirror the reference implementation's formulas:
 *  - haversine distance: /root/reference/pkg/datastructure/distance.go:19-28
 *    (R = 6371.0 km, hav(x) = (1-cos x)/2, c = 2 asin sqrt a)
 *  - destination point: /root/reference/pkg/geo/geometry.go:131-155
 *  - midpoint: geometry.go:67-80
 *  - winding-number point-in-polygon with on-segment short-circuit:
 *    geometry.go:90-126
 *  - segment-circle intersection in a local equirectangular projection
 *    (quadratic discriminant): /root/reference/pkg/datastructure/circle.go:54-96
 *  - point-on-segment 3D projection (s2.Project equivalent):
 *    geometry.go:171-184
 */
object GeoMath {
  val EarthRadiusKm: Double = 6371.0
  val EarthRadiusM: Double = 6371007.0

  @inline def degToRad(d: Double): Double = d * math.Pi / 180.0
  @inline def radToDeg(r: Double): Double = 180.0 * r / math.Pi

  @inline private def hav(angleRad: Double): Double = (1.0 - math.cos(angleRad)) / 2.0

  /** Great-circle distance in km (reference distance.go:19-28). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val la1 = degToRad(lat1); val lo1 = degToRad(lon1)
    val la2 = degToRad(lat2); val lo2 = degToRad(lon2)
    val a = hav(la1 - la2) + math.cos(la1) * math.cos(la2) * hav(lo1 - lo2)
    EarthRadiusKm * 2.0 * math.asin(math.sqrt(a))
  }

  /** Destination point from (lat, lon) along `bearingDeg` for `distKm` (geometry.go:131-155). */
  def destinationPoint(lat: Double, lon: Double, bearingDeg: Double, distKm: Double): (Double, Double) = {
    val dr = distKm / EarthRadiusKm
    val br = degToRad(bearingDeg)
    val la1 = degToRad(lat); val lo1 = degToRad(lon)
    val la2 = math.asin(math.sin(la1) * math.cos(dr) + math.cos(la1) * math.sin(dr) * math.cos(br))
    var lo2 = lo1 + math.atan2(
      math.sin(br) * math.sin(dr) * math.cos(la1),
      math.cos(dr) - math.sin(la1) * math.sin(la2))
    lo2 = ((lo2 + 3 * math.Pi) % (2 * math.Pi)) - math.Pi
    (radToDeg(la2), radToDeg(lo2))
  }

  /** Spherical midpoint (geometry.go:67-80). */
  def midPoint(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double) = {
    val p1 = degToRad(lat1); val p2 = degToRad(lat2)
    val dLon = degToRad(lon2 - lon1)
    val bx = math.cos(p2) * math.cos(dLon)
    val by = math.cos(p2) * math.sin(dLon)
    val newLon = degToRad(lon1) + math.atan2(by, math.cos(p1) + bx)
    val newLat = math.atan2(
      math.sin(p1) + math.sin(p2),
      math.sqrt((math.cos(p1) + bx) * (math.cos(p1) + bx) + by * by))
    (radToDeg(newLat), radToDeg(newLon))
  }

  @inline private def crossProduct(hLat: Double, hLon: Double, tLat: Double, tLon: Double,
                                   qLat: Double, qLon: Double): Double =
    ((tLon - hLon) * (qLat - hLat)) - ((qLon - hLon) * (tLat - hLat))

  @inline private def isPointOnSegmentBBox(pLat: Double, pLon: Double,
                                           aLat: Double, aLon: Double,
                                           bLat: Double, bLon: Double): Boolean =
    pLon >= math.min(aLon, bLon) && pLon <= math.max(aLon, bLon) &&
      pLat >= math.min(aLat, bLat) && pLat <= math.max(aLat, bLat)

  /**
   * Winding-number PIP over an open or closed ring of (lat, lon) vertices.
   * Faithful to geometry.go:104-126 including its bbox-based "on segment"
   * short-circuit (which treats any point inside a segment's bbox as on the
   * boundary) and iteration over `polygon[0 until len-1]`.
   */
  def isPointInPolygon(pLat: Double, pLon: Double, polyLat: Array[Double], polyLon: Array[Double]): Boolean = {
    var wn = 0
    var i = 0
    val n = math.min(polyLat.length, polyLon.length)
    while (i < n - 1) {
      if (isPointOnSegmentBBox(pLat, pLon, polyLat(i), polyLon(i), polyLat(i + 1), polyLon(i + 1)))
        return true
      if (polyLat(i) <= pLat) {
        if (polyLat(i + 1) > pLat &&
          crossProduct(polyLat(i), polyLon(i), polyLat(i + 1), polyLon(i + 1), pLat, pLon) > 0)
          wn += 1
      } else if (polyLat(i + 1) <= pLat &&
        crossProduct(polyLat(i), polyLon(i), polyLat(i + 1), polyLon(i + 1), pLat, pLon) < 0)
        wn -= 1
      i += 1
    }
    wn != 0
  }

  /**
   * Pure winding-number test WITHOUT the reference's edge-bbox short-circuit
   * — used only for driver-side cell classification ([[Cells]] interior
   * cells), where the quirk (which can only ADD acceptance near edges) must
   * not leak into a proof that a whole cell is inside.
   */
  def windingInside(pLat: Double, pLon: Double, polyLat: Array[Double], polyLon: Array[Double]): Boolean = {
    var wn = 0
    var i = 0
    val n = math.min(polyLat.length, polyLon.length)
    while (i < n - 1) {
      if (polyLat(i) <= pLat) {
        if (polyLat(i + 1) > pLat &&
          crossProduct(polyLat(i), polyLon(i), polyLat(i + 1), polyLon(i + 1), pLat, pLon) > 0)
          wn += 1
      } else if (polyLat(i + 1) <= pLat &&
        crossProduct(polyLat(i), polyLon(i), polyLat(i + 1), polyLon(i + 1), pLat, pLon) < 0)
        wn -= 1
      i += 1
    }
    wn != 0
  }

  /**
   * Does segment (lat1,lon1)->(lat2,lon2) intersect the circle
   * (centerLat, centerLon, radiusKm)? Local equirectangular projection at
   * the circle center + quadratic discriminant (circle.go:54-96).
   */
  def lineCircleIntersect(centerLat: Double, centerLon: Double, radiusKm: Double,
                          lat1: Double, lon1: Double, lat2: Double, lon2: Double): Boolean = {
    val cLat = degToRad(centerLat); val cLon = degToRad(centerLon)
    val rM = radiusKm * 1000.0
    @inline def projLat(lat: Double) = lat * EarthRadiusM
    @inline def projLon(lon: Double) = lon * EarthRadiusM * math.cos(cLat)
    val aLat = projLat(degToRad(lat1)); val aLon = projLon(degToRad(lon1))
    val bLat = projLat(degToRad(lat2)); val bLon = projLon(degToRad(lon2))
    val ccLat = projLat(cLat); val ccLon = projLon(cLon)
    val vLat = aLat - ccLat; val vLon = aLon - ccLon
    val uLat = bLat - aLat; val uLon = bLon - aLon
    val alpha = uLat * uLat + uLon * uLon
    val beta = uLat * vLat + uLon * vLon
    val gamma = vLat * vLat + vLon * vLon - rM * rM
    val disc = beta * beta - alpha * gamma
    if (disc < 0) return false
    val sq = math.sqrt(disc)
    val t1 = (-beta + sq) / alpha
    val t2 = (-beta - sq) / alpha
    (t1 >= 0 && t1 <= 1) || (t2 >= 0 && t2 <= 1)
  }

  /**
   * Project `p` onto great-circle segment a->b via 3D unit vectors, clamped
   * to the segment (equivalent of s2.Project used at geometry.go:171-184).
   * Returns (lat, lon) of the closest point on the segment.
   */
  def projectPointToSegment(aLat: Double, aLon: Double, bLat: Double, bLon: Double,
                            pLat: Double, pLon: Double): (Double, Double) = {
    def toXyz(lat: Double, lon: Double): Array[Double] = {
      val la = degToRad(lat); val lo = degToRad(lon)
      Array(math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    }
    def sub(x: Array[Double], y: Array[Double]) = Array(x(0) - y(0), x(1) - y(1), x(2) - y(2))
    def add(x: Array[Double], y: Array[Double]) = Array(x(0) + y(0), x(1) + y(1), x(2) + y(2))
    def scale(x: Array[Double], s: Double) = Array(x(0) * s, x(1) * s, x(2) * s)
    def dot(x: Array[Double], y: Array[Double]) = x(0) * y(0) + x(1) * y(1) + x(2) * y(2)
    val a = toXyz(aLat, aLon); val b = toXyz(bLat, bLon); val p = toXyz(pLat, pLon)
    val ab = sub(b, a)
    val denom = dot(ab, ab)
    val t = if (denom == 0) 0.0 else math.max(0.0, math.min(1.0, dot(sub(p, a), ab) / denom))
    val proj = add(a, scale(ab, t))
    val norm = math.sqrt(dot(proj, proj))
    val u = if (norm == 0) a else scale(proj, 1.0 / norm)
    (radToDeg(math.asin(math.max(-1.0, math.min(1.0, u(2))))), radToDeg(math.atan2(u(1), u(0))))
  }

  /** Min haversine distance from point to a way boundary of (lat, lon)
   *  vertices (pointDistanceToOsmWay, searcher.go:438-460). The reference
   *  iterates j = (i+1) % len — the boundary is treated as a CLOSED ring
   *  (the last->first segment is included); reproduced faithfully. For a
   *  2-vertex boundary the closing segment is the same segment reversed, so
   *  this also serves as single-segment projection distance. */
  def pointToPolylineKm(pLat: Double, pLon: Double, lats: Array[Double], lons: Array[Double]): Double = {
    if (lats.length == 1) return haversineKm(pLat, pLon, lats(0), lons(0))
    var best = Double.MaxValue
    var i = 0
    while (i < lats.length) {
      val j = (i + 1) % lats.length
      val (prLat, prLon) = projectPointToSegment(lats(i), lons(i), lats(j), lons(j), pLat, pLon)
      val d = haversineKm(pLat, pLon, prLat, prLon)
      if (d < best) best = d
      i += 1
    }
    best
  }

  /** Circle membership: haversine <= radius (circle.go:40-42). */
  def circleContains(centerLat: Double, centerLon: Double, radiusKm: Double,
                     lat: Double, lon: Double): Boolean =
    haversineKm(centerLat, centerLon, lat, lon) <= radiusKm
}
