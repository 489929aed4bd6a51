package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GeoMath

/** Golden numeric values ported from the reference's geometry tests
 *  (distance_test.go:9-51, circle_test.go:9-85, geometry_test.go:9-46). */
class GeoMathSpec extends AnyFunSuite {

  test("haversine matches reference goldens +-0.1 km (distance_test.go:9)") {
    val cases = Seq(
      (-7.557155997491524, 110.77170252731288, -7.550209300671982, 110.78942094938256, 2.1),
      (-7.546196863318374, 110.7775170972345, -7.550209300671982, 110.78942094938256, 1.38),
      (-7.759889166547908, 110.36689459108496, -7.760335932763678, 110.37671195413539, 1.08),
      (-7.700002453207869, 110.37712514761436, -7.760335932763678, 110.37671195413539, 6.7))
    for ((a, b, c, d, exp) <- cases)
      assert(math.abs(GeoMath.haversineKm(a, b, c, d) - exp) < 0.1)
  }

  test("circle contains matches reference goldens (circle_test.go:9-34)") {
    val (cLat, cLon, r) = (-7.5680354571554025, 110.81169121664644, 1.0)
    assert(GeoMath.circleContains(cLat, cLon, r, -7.568015281898911, 110.81444088141711))
    assert(GeoMath.circleContains(cLat, cLon, r, -7.572317914672147, 110.81118863253744))
    assert(!GeoMath.circleContains(cLat, cLon, r, -7.559435821190102, 110.80760986341456))
    assert(!GeoMath.circleContains(cLat, cLon, r, -7.55888752969384, 110.81268429828974))
  }

  test("line-circle intersect matches reference goldens (circle_test.go:36-81)") {
    val (cLat, cLon, r) = (-7.559940429364888, 110.78890921003895, 1.0)
    assert(GeoMath.lineCircleIntersect(cLat, cLon, r,
      -7.5577436088673435, 110.78127272655398, -7.564498664733181, 110.8035880873389))
    assert(GeoMath.lineCircleIntersect(cLat, cLon, r,
      -7.554174552910251, 110.76387434819563, -7.564498664733181, 110.8035880873389))
    assert(!GeoMath.lineCircleIntersect(cLat, cLon, r,
      -7.54644310927346, 110.77781694597039, -7.552212073890144, 110.79527493164542))
    assert(!GeoMath.lineCircleIntersect(cLat, cLon, r,
      -7.556780022123904, 110.80638234773562, -7.571822225335152, 110.80379309018404))
    assert(!GeoMath.lineCircleIntersect(cLat, cLon, r,
      -7.54419186409313, 110.77112430380268, -7.561352173450039, 110.7642426738976))
  }

  test("point-in-polygon matches reference goldens (geometry_test.go:9-46)") {
    val poly = Array(
      (-7.8236786093625454, 110.32093322132368),
      (-7.829740180582352, 110.35293804508764),
      (-7.826476268571158, 110.4094171458476),
      (-7.7821777971150485, 110.4098878050206),
      (-7.7821777971150485, 110.43012614945958),
      (-7.763058061783706, 110.43012614945958),
      (-7.742538353844481, 110.34211288410864))
    val lats = poly.map(_._1); val lons = poly.map(_._2)
    assert(GeoMath.isPointInPolygon(-7.786841015007818, 110.35482068177964, lats, lons))
    assert(!GeoMath.isPointInPolygon(-7.709038594647804, 110.5904486305967, lats, lons))
  }

  test("destination point round-trips distance") {
    val (lat, lon) = (-7.5, 110.8)
    for (bearing <- Seq(0.0, 45.0, 90.0, 180.0, 270.0)) {
      val (dLat, dLon) = GeoMath.destinationPoint(lat, lon, bearing, 5.0)
      assert(math.abs(GeoMath.haversineKm(lat, lon, dLat, dLon) - 5.0) < 1e-6)
    }
  }

  test("midpoint is equidistant") {
    val (mLat, mLon) = GeoMath.midPoint(-7.5, 110.7, -7.6, 110.9)
    val d1 = GeoMath.haversineKm(-7.5, 110.7, mLat, mLon)
    val d2 = GeoMath.haversineKm(-7.6, 110.9, mLat, mLon)
    assert(math.abs(d1 - d2) < 1e-9)
  }

  test("column destinationPoint/midPoint agree with the scalar GeoMath forms") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (-7.5, 110.7, 37.5, 12.0), (-6.1, 106.8, 0.5, 1.0),
      (-8.0, 111.0, 359.5, 49.0), (-7.9, 106.1, 180.5, 25.0),
      (8.2, 179.9995, 90.5, 30.0)) // near the antimeridian: wrap exercised
    val df = rows.toDF("lat", "lon", "bearing", "dist")
    val (dLat, dLon) = graft.functions.GeoFunctions.destinationPoint(
      col("lat"), col("lon"), col("bearing"), col("dist"))
    val (mLat, mLon) = graft.functions.GeoFunctions.midPoint(
      col("lat"), col("lon"), col("lat") + 1.0, col("lon") - 2.0)
    val got = df.select(dLat, dLon, mLat, mLon).collect()
    rows.zip(got).foreach { case ((la, lo, b, d), r) =>
      val (ela, elo) = GeoMath.destinationPoint(la, lo, b, d)
      val (mla, mlo) = GeoMath.midPoint(la, lo, la + 1.0, lo - 2.0)
      assert(math.abs(r.getDouble(0) - ela) < 1e-12)
      assert(math.abs(r.getDouble(1) - elo) < 1e-12)
      assert(math.abs(r.getDouble(2) - mla) < 1e-12)
      assert(math.abs(r.getDouble(3) - mlo) < 1e-12)
    }
  }

  test("segment projection clamps and minimizes distance") {
    val (aLat, aLon) = (-7.50, 110.70); val (bLat, bLon) = (-7.50, 110.80)
    // point beyond endpoint b projects to b
    val (p1Lat, p1Lon) = GeoMath.projectPointToSegment(aLat, aLon, bLat, bLon, -7.50, 110.90)
    assert(GeoMath.haversineKm(p1Lat, p1Lon, bLat, bLon) < 1e-6)
    // midpoint-ish point projects near its longitude
    val (p2Lat, p2Lon) = GeoMath.projectPointToSegment(aLat, aLon, bLat, bLon, -7.45, 110.75)
    assert(math.abs(p2Lon - 110.75) < 0.001)
    assert(math.abs(p2Lat - (-7.50)) < 0.001)
  }
}
