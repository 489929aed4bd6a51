package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GeoFunctions._
import graft.query.Geofence.Fence
import graft.sources.Derived

/** Isolates the cost of each stage of the geofence status operator.
 *  Usage: runMain graft.tools.GeofenceProbe <sfDir> */
object GeofenceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fences = graft.entry.SpatialQueries.Fences.all

    def time[A](name: String)(f: => A): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); f
        println(f"GPROBE $name%-12s rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }

    val track = Derived.track(spark, args(0))
    time("track")(track.count())
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withPrev = track
      .withColumn("prev_lat", lag(col("lat"), 1, -999.0).over(w))
      .withColumn("prev_lon", lag(col("lon"), 1, -999.0).over(w))
    time("lag")(withPrev.count())

    val fenceArr = array(fences.map(f => struct(
      lit(f.key).as("fence_key"), lit(f.lat).as("flat"),
      lit(f.lon).as("flon"), lit(f.radiusKm).as("fradius"))): _*)
    val ranked = array_sort(transform(fenceArr, f => struct(
      haversineKm(col("lat"), col("lon"), f("flat"), f("flon")).as("fdist"),
      f("fence_key").as("fence_key"), f("flat").as("flat"),
      f("flon").as("flon"), f("fradius").as("fradius"))))
    time("rank3")(withPrev.withColumn("nf", explode(slice(ranked, 1, 3))).count())
    time("full")(graft.query.Geofence.fenceStatus(track, fences).count())

    // hypothesis: the status CASE is cheap, but fusing it into the same
    // stage as the interpreted higher-order selection forces interpreted eval
    val nearest = withPrev
      .withColumn("nf", explode(slice(ranked, 1, 3)))
      .select(col("*"), col("nf.fence_key").as("fence_key"), col("nf.flat").as("flat"),
        col("nf.flon").as("flon"), col("nf.fradius").as("fradius"), col("nf.fdist").as("fdist"))
      .drop("nf").localCheckpoint(true)
    val prevIn = col("prev_lat") =!= -999.0 &&
      haversineKm(col("flat"), col("flon"), col("prev_lat"), col("prev_lon")) <= col("fradius")
    val currIn = col("fdist") <= col("fradius")
    val crosses = lineCircleIntersect(col("flat"), col("flon"), col("fradius"),
      col("prev_lat"), col("prev_lon"), col("lat"), col("lon"))
    val statuses = when(prevIn && currIn, array(lit("INSIDE")))
      .when(prevIn && !currIn, array(lit("EXIT"), lit("OUTSIDE")))
      .when(!prevIn && currIn, array(lit("ENTER"), lit("INSIDE")))
      .otherwise(when(crosses, array(lit("CROSS"))).otherwise(array(lit("OUTSIDE"))))
    val statusDf = nearest.withColumn("statuses", statuses)
      .select(col("event_id"), col("user_id"), col("ts"), col("fence_key"),
        posexplode(col("statuses")).as(Seq("seq", "status")))
    time("status_only")(statusDf.count())
    time("st_noexpl")(nearest.withColumn("statuses", statuses)
      .select(col("event_id"), col("statuses")).count())
    time("st_nocross")(nearest.withColumn("statuses",
        when(prevIn && currIn, array(lit("INSIDE")))
          .when(prevIn && !currIn, array(lit("EXIT"), lit("OUTSIDE")))
          .when(!prevIn && currIn, array(lit("ENTER"), lit("INSIDE")))
          .otherwise(array(lit("OUTSIDE"))))
      .select(col("event_id"), col("statuses")).count())
    time("st_prevonly")(nearest.withColumn("x", prevIn).select("event_id", "x").count())
    time("st_crossonly")(nearest.withColumn("x", crosses).select("event_id", "x").count())
    // count() prunes unevaluated projections — force evaluation through the
    // generator or an aggregate over the result
    time("expl_const")(nearest.select(posexplode(array(lit("A"), lit("B")))).count())
    time("expl_status")(nearest.select(posexplode(statuses)).count())
    time("agg_status")(nearest.select(size(statuses).as("n")).agg(sum("n")).head())
    val prevDist = haversineKm(col("flat"), col("flon"), col("prev_lat"), col("prev_lon"))
    time("agg_prevd")(nearest.select(prevDist.as("d")).agg(sum("d")).head())
    time("agg_cross")(nearest.select(crosses.cast("int").as("c")).agg(sum("c")).head())
    spark.stop()
  }
}
