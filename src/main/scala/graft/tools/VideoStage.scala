package graft.tools

import org.apache.spark.sql.SparkSession

import graft.images.Video

/**
 * Dumps the engine's video+caption table (real RIFF/AVI bytes) to parquet
 * for the engine-independent Python twin (tools/video_twin.py), the video
 * sibling of the image pipeline stage that tools/image_twin.py reads.
 *
 * Usage: runMain graft.tools.VideoStage [sfDir] [outDir]
 * Then:  python3 tools/video_twin.py <outDir>
 */
object VideoStage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/tmp/video-stage"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Video.videoTable(spark, sfDir).write.mode("overwrite").parquet(outDir)
    println(s"video table written to $outDir")
    spark.stop()
  }
}
