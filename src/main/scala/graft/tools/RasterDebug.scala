package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Raster
import graft.sources.Derived

object RasterDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.graft.raster.debug", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raster = Raster.rasterize(Derived.objects(spark, "/root/testdata/sf0.01"), 10)
    val comps = Raster.vectorize(raster, 62)
    println("components: " + comps.select("component").distinct().count())
    val adj = comps.alias("a").join(comps.alias("b"),
      (abs(col("a.x") - col("b.x")) + abs(col("a.y") - col("b.y"))) === 1 &&
        col("a.component") =!= col("b.component"))
    println("cross-component adjacent pairs: " + adj.count())
    spark.stop()
  }
}
