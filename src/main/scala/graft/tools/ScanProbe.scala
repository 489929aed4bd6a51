package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile of the north job's scan phase: isolates parquet decode,
 *  cell-encode arithmetic, and the per-tile hash aggregation so bench
 *  regressions can be attributed. Diagnostic only.
 *  Usage: runMain graft.tools.ScanProbe <cpus> <inputPath> */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val inputPath = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PROBE $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); a
    }

    val objs = spark.read.parquet(inputPath)
    for (round <- Seq("warm", "timed")) {
      println(s"== $round (cpus=$cpus)")
      time("count")(objs.count())
      time("scan_sum")(objs.agg(sum(col("lat") + col("lon"))).head())
      time("scan_encode")(objs.agg(sum(graft.functions.GeoFunctions.cellEncode(
        col("lat"), col("lon"), graft.core.Cells.DefaultLevel))).head())
      time("tileagg")(objs
        .withColumn("cell", graft.functions.GeoFunctions.cellEncode(
          col("lat"), col("lon"), graft.core.Cells.DefaultLevel))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(sum("n")).head())
    }
    spark.stop()
  }
}
