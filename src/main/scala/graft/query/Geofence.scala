package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GeoFunctions._

/**
 * Geofencing: circle fences vs a stream of per-point positions, with the
 * reference's status-transition semantics
 * (/root/reference/pkg/geofence/geofence.go:97-116):
 *
 *   (prev IN,  curr IN)  -> [INSIDE]
 *   (prev IN,  curr OUT) -> [EXIT, OUTSIDE]
 *   (prev OUT, curr IN)  -> [ENTER, INSIDE]
 *   (prev OUT, curr OUT) -> [CROSS] if segment prev->curr intersects the
 *                           circle (circle.go:54-96) else [OUTSIDE]
 *
 * A missing previous position is the sentinel (-999, -999) treated as
 * OUTSIDE (fence_index.go:61-64). "Contains" is haversine <= radius
 * (circle.go:40-42).
 *
 * Batch semantics: the reference processes one API call at a time and reads
 * the previous position from a KV store (kv_db.go:109-137) — the batch
 * equivalent is lag() over (point, ts). The fence set is tiny and broadcast.
 * The reference evaluates only the 3 fences nearest to the current point
 * (geofence.go:65); `nearestFences` reproduces that cap (ordered by center
 * distance — the reference orders by R-tree bbox min-dist, identical for
 * point-like circle bounds of equal radius).
 */
object Geofence {

  case class Fence(key: String, lat: Double, lon: Double, radiusKm: Double)

  /**
   * track: (event_id, user_id, ts, lat, lon); fences broadcast.
   * Returns one row per emitted status: (event_id, user_id, ts, fence_key,
   * seq, status) where seq orders multi-status emissions (EXIT/OUTSIDE,
   * ENTER/INSIDE).
   */
  def fenceStatus(track: DataFrame, fences: Seq[Fence], nearestFences: Int = 3): DataFrame = {
    val spark = track.sparkSession
    import spark.implicits._
    val f = fences.toDF("fence_key", "flat", "flon", "fradius")

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withPrev = track
      .withColumn("prev_lat", lag(col("lat"), 1, -999.0).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1, -999.0).over(w))

    // keep the `nearestFences` fences per point, by center distance
    val joined = withPrev.join(broadcast(f), lit(true), "inner")
      .withColumn("fdist", haversineKm(col("lat"), col("lon"), col("flat"), col("flon")))
    val wf = Window.partitionBy(col("event_id")).orderBy(col("fdist"), col("fence_key"))
    val nearest = joined.withColumn("frank", row_number().over(wf))
      .filter(col("frank") <= nearestFences)

    val prevIn = col("prev_lat") =!= -999.0 &&
      haversineKm(col("flat"), col("flon"), col("prev_lat"), col("prev_lon")) <= col("fradius")
    val currIn =
      haversineKm(col("flat"), col("flon"), col("lat"), col("lon")) <= col("fradius")
    val crosses = lineCircleIntersect(col("flat"), col("flon"), col("fradius"),
      col("prev_lat"), col("prev_lon"), col("lat"), col("lon"))

    val statuses = when(prevIn && currIn, array(lit("INSIDE")))
      .when(prevIn && !currIn, array(lit("EXIT"), lit("OUTSIDE")))
      .when(!prevIn && currIn, array(lit("ENTER"), lit("INSIDE")))
      .otherwise(when(crosses, array(lit("CROSS"))).otherwise(array(lit("OUTSIDE"))))

    nearest
      .withColumn("statuses", statuses)
      .select(col("event_id"), col("user_id"), col("ts"), col("fence_key"),
        posexplode(col("statuses")).as(Seq("seq", "status")))
  }
}
