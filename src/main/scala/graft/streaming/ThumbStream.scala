package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.images.Images

/** One fingerprinted thumbnail row inside the stream. */
case class ThumbFp(ts: java.sql.Timestamp, thumb_id: String,
                   fp: Long, pxh: Long, px: Seq[Int], lossless: Boolean)

/**
 * Streaming reverse image lookup — the live half of [[Images.thumbMatch]]
 * (d7): a stream of (ts, thumb_id, bytes, w, h, fmt) crawl rows is matched
 * against a STATIC fingerprinted catalog. Shape:
 *
 *  - decode + fingerprint run map-side inside the micro-batch
 *    (`Dataset.mapPartitions` — the streaming-legal twin of the batch
 *    RDD mapPartitions; bytes never reach a shuffle);
 *  - candidates come from a stream-static equi-join on the same band keys
 *    as the batch operator ([[Images.bandKeyArray]]), against a catalog
 *    DataFrame that at scale is a bucketed at-rest table;
 *  - the refine is the identical predicate ([[Images.refinePredicate]]).
 *
 * In exact mode (hamMax = 0) the whole query is STATELESS — the single
 * join key is the full-matrix content hash (singleton buckets at any
 * corpus size), no duplicate candidates, no watermark, so throughput
 * scales with executor count and state is zero. Banded mode (hamMax in [1,3]) can
 * emit one candidate per matching band; those collapse through
 * `dropDuplicatesWithinWatermark`, whose state is one entry per MATCHED
 * pair within the horizon — bounded by output rate, not corpus size.
 */
object ThumbStream {

  /** Fingerprint the streaming thumbnail rows (streaming-safe). */
  def fingerprints(thumbs: DataFrame): Dataset[ThumbFp] = {
    val enc = Encoders.product[ThumbFp]
    thumbs.select(col("ts").cast("timestamp"), col("thumb_id"), col("bytes"),
        col("w"), col("h"), col("fmt"))
      .mapPartitions(_.flatMap { r =>
        Images.tryDecode(r.getAs[Array[Byte]]("bytes")).collect {
          case dec if dec.length == r.getAs[Int]("w") * r.getAs[Int]("h") =>
            val px8 =
              if (r.getAs[Int]("w") == 8 && r.getAs[Int]("h") == 8) dec
              else Images.resizePx(dec, r.getAs[Int]("w"), r.getAs[Int]("h"), 8, 8)
            ThumbFp(r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("thumb_id"),
              Images.ahash8(px8), Images.pxHash(px8), px8.toSeq,
              r.getAs[String]("fmt") == "png")
        }
      })(enc)
  }

  /**
   * Match the thumbnail stream against `catalog` (the input_hint image
   * table, static). Output: (ts, thumb_id, image_id, hamming), append mode.
   * `watermarkDelay` only matters in banded mode (pair-dedup horizon).
   */
  def matchStream(thumbStream: DataFrame, catalog: DataFrame, hamMax: Int,
                  lossyTol: Int, watermarkDelay: String = "10 minutes"): DataFrame = {
    require(hamMax >= 0 && hamMax <= 3, s"4x16 banding covers hamming <= 3, got $hamMax")
    val catB = Images.thumbFingerprints(
        catalog.withColumnRenamed("image_id", "cat_id"), "cat_id")
      .select(col("cat_id"), col("fp").as("c_fp"), col("px").as("c_px"),
        col("lossless").as("c_ll"),
        explode(Images.bandKeyArray(col("fp"), col("pxh"), hamMax)).as("band_key"))
    val t = fingerprints(thumbStream)
      .select(col("ts"), col("thumb_id"), col("fp").as("t_fp"),
        col("px").as("t_px"), col("lossless").as("t_ll"),
        explode(Images.bandKeyArray(col("fp"), col("pxh"), hamMax)).as("band_key"))
    val matched = t.join(catB, Seq("band_key"))
      .withColumn("hamming", bit_count(col("t_fp").bitwiseXOR(col("c_fp"))).cast("int"))
      .filter(Images.refinePredicate(hamMax, lossyTol))
      .select(col("ts"), col("thumb_id"), col("cat_id").as("image_id"), col("hamming"))
    if (hamMax == 0) matched // single join key: no duplicate candidates
    else matched.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("thumb_id", "image_id")
  }

  /** Drive a batch thumbnail table through the stream synchronously
   *  (memory sink, AvailableNow) — test/parity harness, same pattern as
   *  [[DedupStream.runBatchAsStream]]. */
  def runBatchAsStream(spark: SparkSession, thumbs: DataFrame, catalog: DataFrame,
                       hamMax: Int, lossyTol: Int,
                       queryName: String = "thumb_stream"): DataFrame = {
    val dirPath = java.nio.file.Files.createTempDirectory("thumb_stream_src")
    val dir = dirPath.toString
    try {
      thumbs.select("ts", "thumb_id", "bytes", "w", "h", "fmt")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .parquet(dir)
      val q = matchStream(stream, catalog, hamMax, lossyTol)
        .writeStream.outputMode("append")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sink = spark.table(queryName)
      val rows = sink.collect().toSeq
      val out = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 4096 + 1)),
        sink.schema)
      spark.catalog.dropTempView(queryName)
      out
    } finally {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(dirPath))
        java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
