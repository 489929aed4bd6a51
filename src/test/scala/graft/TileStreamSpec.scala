package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Cells
import graft.sources.Derived
import graft.streaming.TileStream

/**
 * Streaming tile ingest: windowed per-tile counts under a watermark must
 * equal the batch aggregation for every window the watermark has closed,
 * and the open tail window must be withheld (append mode emits only
 * finalized windows).
 */
class TileStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("windowed tile counts: stream (append + watermark) equals batch on closed windows") {
    val track = Derived.track(spark, Sf).select("ts", "lat", "lon")
      .withColumn("ts", col("ts").cast("timestamp"))
    val streamed = TileStream.runBatchAsStream(spark, track,
      windowDur = "10 minutes", watermarkDelay = "5 minutes",
      queryName = "tile_stream_spec")

    // batch twin over the same rows
    val batch = track
      .withColumn("cell", graft.functions.GeoFunctions.cellEncode(
        col("lat"), col("lon"), Cells.DefaultLevel))
      .groupBy(window(col("ts"), "10 minutes"), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("cell"), col("n"))

    // append mode finalizes a window once the watermark (maxTs - delay)
    // passes its end; the open tail is withheld by design
    val maxTs = track.agg(max("ts")).head().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 5 * 60 * 1000)
    val closed = batch.filter(col("win_end") <= lit(cutoff))

    assert(streamed.count() > 0, "stream emitted nothing")
    assert(streamed.except(closed).isEmpty && closed.except(streamed).isEmpty,
      "stream/batch mismatch on closed windows")
    // the open tail window exists in batch but not in the stream output
    assert(batch.count() > streamed.count(), "open tail window was not withheld")
  }
}
