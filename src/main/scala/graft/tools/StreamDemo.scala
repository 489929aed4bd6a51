package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Derived
import graft.streaming.{GeofenceStream, TileStream}
import graft.entry.SpatialQueries

/** Drive both streaming operators end-to-end against an sf dir and print
 *  row counts + a sample: usage `runMain graft.tools.StreamDemo [sfDir]`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tiles = TileStream.runBatchAsStream(spark,
      Derived.track(spark, sfDir).select("ts", "lat", "lon"))
    println(s"""{"stream":"tile_counts","rows":${tiles.count()}}""")
    tiles.orderBy(desc("n")).show(5, truncate = false)

    val fenced = GeofenceStream.runBatchAsStream(spark,
      Derived.track(spark, sfDir), SpatialQueries.Fences.all)
    println(s"""{"stream":"geofence","rows":${fenced.count()}}""")
    fenced.groupBy("status").count().orderBy(desc("count")).show(truncate = false)
    spark.stop()
  }
}
