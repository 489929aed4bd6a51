package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Cells
import graft.functions.GeoFunctions

/**
 * Streaming ingest of the north pipeline: a stream of positioned rows is
 * tile-assigned with the same [[GeoFunctions.cellEncode]] expression as the
 * batch path and aggregated into event-time-windowed per-tile counts with a
 * watermark bounding state (late rows beyond the watermark are dropped —
 * the Structured Streaming shape the reference lacks entirely; its geofence
 * API processes one request at a time, /root/reference/pkg/geofence).
 *
 * At scale this is the live half of the tiling engine: the windowed counts
 * table is exactly the dense-tile histogram that [[graft.pipeline.Skew]]
 * consumes for adaptive splitting, continuously maintained.
 */
object TileStream {

  /** windowed per-tile counts: (window.start, window.end, cell, n).
   *  `points` must carry (ts: timestamp, lat, lon). */
  def tileCounts(points: DataFrame,
                 level: Int = Cells.DefaultLevel,
                 windowDur: String = "10 minutes",
                 watermarkDelay: String = "5 minutes"): DataFrame =
    points
      // watermarks require TIMESTAMP (with zone); parquet often carries NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("cell", GeoFunctions.cellEncode(col("lat"), col("lon"), level))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("cell"), col("n"))

  /** Drive a batch table through the streaming query synchronously (memory
   *  sink, AvailableNow) — test/parity harness, same pattern as
   *  [[GeofenceStream.runBatchAsStream]]. */
  def runBatchAsStream(spark: SparkSession, points: DataFrame,
                       level: Int = Cells.DefaultLevel,
                       windowDur: String = "10 minutes",
                       watermarkDelay: String = "5 minutes",
                       queryName: String = "tile_stream"): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("tile_stream_src").toString
    points.select("ts", "lat", "lon")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
    val q = tileCounts(stream, level, windowDur, watermarkDelay)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
