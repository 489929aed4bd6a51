package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.images.Images
import graft.streaming.ThumbStream

/** Streaming reverse image lookup: batch/stream parity in both modes over
 *  the real mixed-codec tables, and the stateless plan shape of exact
 *  mode. */
class ThumbStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalog = Images.imageTable(spark, TestSpark.Sf).cache()
  private lazy val thumbs = {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    Images.thumbTable(spark, TestSpark.Sf)
      .withColumn("ts", lit(base)).cache()
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String, Int)] =
    df.select("thumb_id", "image_id", "hamming").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("banded mode: stream output equals the batch operator's") {
    val batch = Images.thumbMatch(catalog, thumbs, hamMax = 3,
      maxBucket = None, lossyTol = 16)
    val stream = ThumbStream.runBatchAsStream(spark, thumbs, catalog,
      hamMax = 3, lossyTol = 16, queryName = "thumb_stream_banded")
    assert(pairs(stream) == pairs(batch))
    assert(stream.count() == stream.dropDuplicates("thumb_id", "image_id").count())
  }

  test("exact mode: stream output equals the batch operator's and is stateless") {
    val batch = Images.thumbMatch(catalog, thumbs, hamMax = 0,
      maxBucket = None, lossyTol = 16)
    val stream = ThumbStream.runBatchAsStream(spark, thumbs, catalog,
      hamMax = 0, lossyTol = 16, queryName = "thumb_stream_exact")
    assert(pairs(stream) == pairs(batch))
    // stateless: the logical plan carries no dedup/aggregation state op
    val empty = java.nio.file.Files.createTempDirectory("thumb_stream_plan").toString
    val plan = ThumbStream.matchStream(
      spark.readStream.schema(thumbs.drop("ts").schema
          .add("ts", org.apache.spark.sql.types.TimestampType))
        .parquet(empty),
      catalog, hamMax = 0, lossyTol = 16)
      .queryExecution.logical.toString
    assert(!plan.contains("DeduplicateWithinWatermark"))
    assert(!plan.contains("Aggregate"))
  }
}
