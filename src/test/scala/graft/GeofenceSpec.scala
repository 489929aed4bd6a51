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

  test("join path == literal path row-for-row (cell-keyed ring join parity)") {
    // a grid of 40 fences over the derived track's region, still below
    // LiteralFenceMax so BOTH plans can run on the same input
    val fences = (for (i <- 0 until 8; j <- 0 until 5) yield
      Fence(f"g$i%02d_$j", -8.2 + i * 0.35, 110.0 + j * 0.5, 20.0 + (i + j) % 3 * 10)).toSeq
    val track = Derived.track(spark, TestSpark.Sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))
    val lit = Geofence.fenceStatus(track, fences)
      .select("event_id", "fence_key", "seq", "status").collect().map(key).toSet
    val fenceDf = fences.map(f => (f.key, f.lat, f.lon, f.radiusKm))
      .toDF("fence_key", "flat", "flon", "fradius")
    val joined = Geofence.fenceStatusJoin(track, fenceDf)
      .select("event_id", "fence_key", "seq", "status").collect().map(key).toSet
    assert(joined == lit, s"join plan diverged: ${joined.diff(lit).take(3)} vs ${lit.diff(joined).take(3)}")
    assert(lit.nonEmpty)
  }

  test("10k fences plan a broadcast join, not a 10k-element literal") {
    val fences = (0 until 10000).map(i =>
      Fence(f"k$i%05d", -8.5 + (i % 100) * 0.02, 105.5 + (i / 100) * 0.05, 5.0))
    val track = Seq((1L, 1L, ts(0), -7.5, 108.0), (2L, 1L, ts(1), -7.4, 108.1))
      .toDF("event_id", "user_id", "ts", "lat", "lon")
    val fenceDf = fences.map(f => (f.key, f.lat, f.lon, f.radiusKm))
      .toDF("fence_key", "flat", "flon", "fradius")
    // the per-round join plans a broadcast hash join over the fence TABLE,
    // with no fence-key literals anywhere in the plan
    val roundPlan = Geofence.fenceRoundCandidates(
      track.withColumn("prev_lat", lit(-999.0)).withColumn("prev_lon", lit(-999.0)),
      fenceDf, 8, 2).queryExecution.executedPlan.toString
    assert(roundPlan.contains("BroadcastHashJoin"),
      s"expected a broadcast join in the large-fence round plan:\n$roundPlan")
    assert(!roundPlan.contains("k09999"),
      "fence keys must not be inlined as plan literals")
    // the dispatching operator itself takes the join path (>LiteralFenceMax)
    // and its FINAL plan reads checkpointed rounds — also literal-free
    val out = Geofence.fenceStatus(track, fences)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("k09999"),
      "fence keys must not be inlined as plan literals")
    // ...and still emits exactly 3-nearest statuses per point
    val rows = out.collect()
    assert(rows.length >= 2 * 3 && rows.forall(_.getString(5).nonEmpty))
    val perEvent = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).distinct.length)
    assert(perEvent.values.forall(_ == 3), s"expected 3 nearest fences per point: $perEvent")
  }

  test("FenceGrid: ring-probe k-nearest == full-scan k-nearest over 10k fences") {
    val fences = (0 until 10000).map(i =>
      Fence(f"k$i%05d", -8.5 + (i % 100) * 0.02, 105.5 + (i / 100) * 0.05, 5.0))
    val grid = Geofence.FenceGrid.build(fences)
    val points = (0 until 50).map(i => (-8.6 + i * 0.045, 105.3 + i * 0.11)) ++
      Seq((-20.0, 150.0), (-8.5, 105.5)) // far outside + exactly on a center
    for ((lat, lon) <- points; k <- Seq(1, 3, 7)) {
      val brute = fences
        .sortBy(f => (graft.core.GeoMath.haversineKm(lat, lon, f.lat, f.lon), f.key))
        .take(k).map(_.key)
      assert(grid.nearest(lat, lon, k).map(_.key) == brute,
        s"grid k-nearest diverged at ($lat,$lon) k=$k")
    }
  }

  test("streaming geofence at 10k fences (cell-grid path) == batch ring join") {
    val fences = (0 until 10000).map(i =>
      Fence(f"k$i%05d", -8.5 + (i % 100) * 0.02, 105.5 + (i / 100) * 0.05, 5.0))
    assert(fences.size > Geofence.LiteralFenceMax)
    val track = (0 until 24).map { i =>
      (i.toLong, (i % 4).toLong, ts(i), -8.4 + (i % 7) * 0.15, 105.6 + (i % 5) * 0.9)
    }.toDF("event_id", "user_id", "ts", "lat", "lon")
    val batch = Geofence.fenceStatus(track, fences) // dispatches to the ring join
      .select("event_id", "fence_key", "seq", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    val stream = GeofenceStream.runBatchAsStream(spark, track, fences,
        queryName = "geofence_stream_10k")
      .select("event_id", "fence_key", "seq", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(batch.nonEmpty && stream == batch,
      s"stream/batch diverged: ${stream.diff(batch).take(3)} vs ${batch.diff(stream).take(3)}")
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
