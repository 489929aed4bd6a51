package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.GeoMath
import graft.query.Geofence
import graft.query.Geofence.Fence
import graft.sources.Derived
import graft.streaming.GeofenceStream

/**
 * Geofence transition truth table (/root/reference/pkg/geofence/
 * geofence.go:97-116) and batch-vs-streaming parity.
 */
class GeofenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val fence = Fence("f", -7.5, 110.8, 2.0)
  def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // positions: inside = center; outside = ~10 km east; far = ~30 km east
  val inside = (-7.5, 110.8)
  val outside = (-7.5, 110.895)
  val outsideW = (-7.5, 110.705)
  val far = (-7.5, 111.1)

  def runBatch(track: Seq[(Long, Long, Timestamp, Double, Double)]): Seq[(Long, Int, String)] =
    Geofence.fenceStatus(
        track.toDF("event_id", "user_id", "ts", "lat", "lon"), Seq(fence))
      .select("event_id", "seq", "status").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted

  test("empty fence set: zero status rows, schema intact (FenceStore's empty-collection state)") {
    val track = Seq((1L, 1L, ts(0), inside._1, inside._2))
      .toDF("event_id", "user_id", "ts", "lat", "lon")
    val out = Geofence.fenceStatus(track, Seq.empty)
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "fence_key", "seq", "status"))
    assert(out.count() == 0)
  }

  test("IN->IN = INSIDE; IN->OUT = EXIT,OUTSIDE; OUT->IN = ENTER,INSIDE") {
    val out = runBatch(Seq(
      (1L, 1L, ts(0), inside._1, inside._2),   // first seen (prev sentinel): ENTER,INSIDE
      (2L, 1L, ts(1), inside._1, inside._2),   // IN->IN: INSIDE
      (3L, 1L, ts(2), outside._1, outside._2), // IN->OUT: EXIT,OUTSIDE
      (4L, 1L, ts(3), inside._1, inside._2)))  // OUT->IN: ENTER,INSIDE
    assert(out == Seq(
      (1L, 0, "ENTER"), (1L, 1, "INSIDE"),
      (2L, 0, "INSIDE"),
      (3L, 0, "EXIT"), (3L, 1, "OUTSIDE"),
      (4L, 0, "ENTER"), (4L, 1, "INSIDE")).sorted)
  }

  test("OUT->OUT crossing the circle = CROSS; not crossing = OUTSIDE") {
    assert(GeoMath.lineCircleIntersect(fence.lat, fence.lon, fence.radiusKm,
      outsideW._1, outsideW._2, outside._1, outside._2))
    val out = runBatch(Seq(
      (1L, 2L, ts(0), outsideW._1, outsideW._2), // first seen, outside
      (2L, 2L, ts(1), outside._1, outside._2),   // OUT->OUT through center: CROSS
      (3L, 2L, ts(2), far._1, far._2)))          // OUT->OUT east, no cross: OUTSIDE
    assert(out.filter(_._1 == 2L) == Seq((2L, 0, "CROSS")))
    assert(out.filter(_._1 == 3L) == Seq((3L, 0, "OUTSIDE")))
  }

  test("only the 3 nearest fences are evaluated (geofence.go:65)") {
    val fences = Seq(
      Fence("a", -7.5, 110.80, 2.0), Fence("b", -7.5, 110.82, 2.0),
      Fence("c", -7.5, 110.84, 2.0), Fence("d", -7.5, 112.5, 2.0))
    val out = Geofence.fenceStatus(
        Seq((1L, 1L, ts(0), -7.5, 110.8)).toDF("event_id", "user_id", "ts", "lat", "lon"),
        fences)
      .select("fence_key").distinct().collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b", "c"))
  }

  test("FenceStore: persisted named collections with MERGE upsert (fence_index.go:21-48,88-96)") {
    val dir = java.nio.file.Files.createTempDirectory("fence-store").toString
    val store = new Geofence.FenceStore(spark, dir)
    store.addCollection("jakarta")
    intercept[IllegalArgumentException](store.addCollection("jakarta")) // AddFence errors on dup (:33-38)
    intercept[IllegalArgumentException](store.fences("nope"))           // Search errors on missing (:49-54)
    assert(store.fences("jakarta") == Seq.empty)                        // empty collection persists
    store.upsertFencePoint("jakarta", Fence("a", -7.5, 110.8, 2.0))
    store.upsertFencePoint("jakarta", Fence("b", -7.6, 110.9, 3.0))
    // MERGE: same key replaces
    store.upsertFencePoint("jakarta", Fence("a", -7.5, 110.8, 9.0))
    // a second collection does not interfere
    store.addCollection("bogor")
    store.upsertFencePoint("bogor", Fence("a", -6.6, 106.8, 1.0))
    // a fresh store instance re-reads everything from disk
    val store2 = new Geofence.FenceStore(spark, dir)
    assert(store2.fences("jakarta") ==
      Seq(Fence("a", -7.5, 110.8, 9.0), Fence("b", -7.6, 110.9, 3.0)))
    assert(store2.fences("bogor") == Seq(Fence("a", -6.6, 106.8, 1.0)))
    store2.deleteCollection("jakarta")
    intercept[IllegalArgumentException](store2.fences("jakarta"))
    assert(store2.fences("bogor").nonEmpty)
    // search delegates to fenceStatus over the persisted fences
    val out = store2.search("bogor",
      Seq((1L, 1L, new java.sql.Timestamp(0), -6.6, 106.8))
        .toDF("event_id", "user_id", "ts", "lat", "lon"))
      .select("status").collect().map(_.getString(0)).toSet
    assert(out == Set("ENTER", "INSIDE"))
  }

  test("streaming flatMapGroupsWithState output equals the batch operator") {
    val track = Derived.track(spark, TestSpark.Sf).filter(col("user_id") < 5)
    val fences = graft.entry.SpatialQueries.Fences.all
    val batch = Geofence.fenceStatus(track, fences)
      .select("event_id", "fence_key", "seq", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    val stream = GeofenceStream.runBatchAsStream(spark, track, fences)
      .select("event_id", "fence_key", "seq", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(batch.nonEmpty)
    assert(stream == batch)
  }
}
