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
   * Persisted named fence collections (reference FenceIndex,
   * /root/reference/pkg/geofence/fence_index.go:21-48,88-96): collections
   * survive across requests and process restarts (the reference holds them
   * in server memory + a bbolt KV for query points; the batch equivalent is
   * a small parquet table with MERGE-by-key semantics).
   *
   *  - addCollection   = AddFence (:33-38, errors when it already exists)
   *  - deleteCollection = DeleteFence (:40-42)
   *  - upsertFencePoint = AddFencePoint (:88-96) with upsert semantics:
   *    the new circle replaces a same-key circle in the collection
   *  - fences(name) errors when the collection is missing, like Search
   *    (:49-54)
   *
   * Fence tables are broadcast-scale; each mutation rewrites the table
   * (at warehouse scale this becomes an Iceberg MERGE INTO — the call
   * shape is identical). An empty collection is a marker row with a null
   * fence_key.
   */
  class FenceStore(spark: SparkSession, dir: String) {
    import spark.implicits._
    private val path = s"$dir/fences.parquet"

    private def emptyTable: DataFrame =
      Seq.empty[(String, Option[String], Double, Double, Double)]
        .toDF("collection", "fence_key", "flat", "flon", "fradius")

    def load(): DataFrame =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        spark.read.parquet(path)
      else emptyTable

    private def write(df: DataFrame): Unit = {
      // fence tables are tiny: collect-rewrite keeps the overwrite atomic
      // even though the source of the new table is the table itself
      val rows = df.collect().toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), df.schema)
        .write.mode("overwrite").parquet(path)
    }

    def collectionExists(name: String): Boolean =
      load().filter(col("collection") === name).limit(1).count() > 0

    def addCollection(name: String): Unit = {
      require(!collectionExists(name), s"fence already exists: $name")
      write(load().unionByName(
        Seq((name, Option.empty[String], 0.0, 0.0, 0.0))
          .toDF("collection", "fence_key", "flat", "flon", "fradius")))
    }

    def deleteCollection(name: String): Unit =
      write(load().filter(col("collection") =!= name))

    /** MERGE by (collection, fence_key): the new circle wins. */
    def upsertFencePoint(name: String, fence: Fence): Unit = {
      require(collectionExists(name), s"FenceIndex does not contain fence $name")
      val kept = load().filter(
        col("collection") =!= name || col("fence_key").isNull ||
          col("fence_key") =!= fence.key)
      write(kept.unionByName(
        Seq((name, Option(fence.key), fence.lat, fence.lon, fence.radiusKm))
          .toDF("collection", "fence_key", "flat", "flon", "fradius")))
    }

    def fences(name: String): Seq[Fence] = {
      require(collectionExists(name), s"FenceIndex does not contain fence $name")
      load().filter(col("collection") === name && col("fence_key").isNotNull)
        .collect()
        .map(r => Fence(r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(_.key).toSeq
    }

    /** FenceIndex.Search recast for batch: status of a track against the
     *  named persisted collection (fence_index.go:49-72). */
    def search(name: String, track: DataFrame, nearestFences: Int = 3): DataFrame =
      fenceStatus(track, fences(name), nearestFences)
  }

  /**
   * track: (event_id, user_id, ts, lat, lon); fences broadcast.
   * Returns one row per emitted status: (event_id, user_id, ts, fence_key,
   * seq, status) where seq orders multi-status emissions (EXIT/OUTSIDE,
   * ENTER/INSIDE).
   */
  def fenceStatus(track: DataFrame, fences: Seq[Fence], nearestFences: Int = 3): DataFrame = {
    val spark = track.sparkSession
    import spark.implicits._

    // empty fence set (a supported FenceStore state: collection exists, no
    // circles yet): no statuses, like the reference's FenceIndex.Search
    // over an empty index. Without this guard the zero-struct literal
    // array() types as array<null> and the transform lambda's field
    // extraction fails analysis.
    if (fences.isEmpty)
      return track
        .select(col("event_id"), col("user_id"), col("ts"),
          lit("").as("fence_key"), lit(0).as("seq"), lit("").as("status"))
        .limit(0)

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withPrev = track
      .withColumn("prev_lat", lag(col("lat"), 1, -999.0).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1, -999.0).over(w))

    // keep the `nearestFences` fences per point, by center distance — the
    // fence set is a literal array, so per-row sort + slice selects the
    // nearest MAP-SIDE: no track x fences cross product through a
    // row_number window (that shape shuffles every candidate row; this one
    // adds zero shuffles beyond the lag window above). struct field order
    // (fdist, fence_key) makes array_sort reproduce ORDER BY fdist, key.
    val fenceArr = array(fences.map(f => struct(
      lit(f.key).as("fence_key"), lit(f.lat).as("flat"),
      lit(f.lon).as("flon"), lit(f.radiusKm).as("fradius"))): _*)
    val ranked = array_sort(transform(fenceArr, f => struct(
      haversineKm(col("lat"), col("lon"), f("flat"), f("flon")).as("fdist"),
      f("fence_key").as("fence_key"), f("flat").as("flat"),
      f("flon").as("flon"), f("fradius").as("fradius"))))
    val nearest = withPrev
      .withColumn("nf", explode(slice(ranked, 1, nearestFences)))
      .select(col("*"), col("nf.fence_key").as("fence_key"), col("nf.flat").as("flat"),
        col("nf.flon").as("flon"), col("nf.fradius").as("fradius"),
        col("nf.fdist").as("fdist"))
      .drop("nf")

    // each predicate is computed ONCE as a boolean column before the CASE:
    // CaseWhen branches are lazily evaluated, so Catalyst cannot eliminate
    // a subexpression shared ACROSS branches — inlining these re-evaluated
    // the prev-position haversine in every branch condition (measured 1.7 s
    // vs 0.3 s for the whole status projection at sf0.1). curr_in reuses
    // the nearest-fence distance already computed for the ranking.
    val prevIn = col("prev_lat") =!= -999.0 &&
      haversineKm(col("flat"), col("flon"), col("prev_lat"), col("prev_lon")) <= col("fradius")
    val currIn = col("fdist") <= col("fradius")
    val crosses = lineCircleIntersect(col("flat"), col("flon"), col("fradius"),
      col("prev_lat"), col("prev_lon"), col("lat"), col("lon"))

    val statuses = when(col("prev_in") && col("curr_in"), array(lit("INSIDE")))
      .when(col("prev_in") && !col("curr_in"), array(lit("EXIT"), lit("OUTSIDE")))
      .when(!col("prev_in") && col("curr_in"), array(lit("ENTER"), lit("INSIDE")))
      .otherwise(when(col("crossed"), array(lit("CROSS"))).otherwise(array(lit("OUTSIDE"))))

    nearest
      .withColumn("prev_in", prevIn)
      .withColumn("curr_in", currIn)
      .withColumn("crossed", crosses)
      .withColumn("statuses", statuses)
      .select(col("event_id"), col("user_id"), col("ts"), col("fence_key"),
        posexplode(col("statuses")).as(Seq("seq", "status")))
  }
}
