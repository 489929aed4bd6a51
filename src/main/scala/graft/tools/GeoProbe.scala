package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.entry.SpatialQueries
import graft.query.Geofence
import graft.sources.Derived

/** Stage-by-stage wall breakdown of st2_geofence (optimization-round
 *  diagnostics). Usage: runMain graft.tools.GeoProbe [sfDir] */
object GeoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GPROBE $label%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val track = Derived.track(spark, sfDir)
    track.count() // warm
    import graft.functions.GeoFunctions.haversineKm
    val fences = SpatialQueries.Fences.all
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withPrev = track
      .withColumn("prev_lat", lag(col("lat"), 1, -999.0).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1, -999.0).over(w))
    val fenceArr = array(fences.map(f => struct(
      lit(f.key).as("fence_key"), lit(f.lat).as("flat"),
      lit(f.lon).as("flon"), lit(f.radiusKm).as("fradius"))): _*)
    val ranked = array_sort(transform(fenceArr, f => struct(
      haversineKm(col("lat"), col("lon"), f("flat"), f("flon")).as("fdist"),
      f("fence_key").as("fence_key"), f("flat").as("flat"),
      f("flon").as("flon"), f("fradius").as("fradius"))))
    val nearest = withPrev
      .withColumn("nf", explode(slice(ranked, 1, 3)))
      .select(col("*"), col("nf.fence_key").as("fence_key"), col("nf.flat").as("flat"),
        col("nf.flon").as("flon"), col("nf.fradius").as("fradius"),
        col("nf.fdist").as("fdist"))
      .drop("nf")
    for (rep <- 1 to 2) {
      t(s"track_scan_$rep")(track.write.format("noop").mode("overwrite").save())
      t(s"withprev_$rep")(withPrev.write.format("noop").mode("overwrite").save())
      t(s"ranked_$rep")(withPrev.withColumn("rk", ranked)
        .write.format("noop").mode("overwrite").save())
      t(s"nearest_$rep")(nearest.write.format("noop").mode("overwrite").save())
      t(s"status_full_$rep")(
        Geofence.fenceStatus(track, fences)
          .write.format("noop").mode("overwrite").save())
      t(s"full_orderby_$rep")(
        Geofence.fenceStatus(track, fences)
          .select(col("event_id"), col("fence_key"), col("seq"), col("status"))
          .orderBy(col("event_id"), col("fence_key"), col("seq")).count())
    }
    spark.stop()
  }
}
