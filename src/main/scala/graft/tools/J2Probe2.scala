package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Spatial
import graft.sources.Derived
import graft.core.Cells
import graft.functions.GeoFunctions._
object J2Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f
      println(f"J2P $l%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r }
    val o = Derived.objects(spark, sfDir); o.count()
    val left = o.filter(col("id") % 11 === 0 && col("id") % 5 =!= 0)
    val right = o.filter(col("id") % 5 === 0)
    // replicate nearestJoin internals
    val maxKm = 30.0
    val l = left.select(min(col("lat")), max(col("lat"))).head()
    val bandLat = math.min(89.9, math.max(math.abs(l.getDouble(0)), math.abs(l.getDouble(1))) + maxKm / Cells.KmPerDegLat)
    println(s"counts left=${left.count()} right=${right.count()}")
    def radAt(lvl: Int): Int = math.max(1, math.ceil(maxKm / math.min(Cells.cellWidthKm(bandLat, lvl), Cells.cellHeightKm(lvl))).toInt)
    var lvl = 13; while (radAt(lvl) > 2 && lvl > 1) lvl -= 1
    val rad = radAt(lvl)
    println(s"lvl=$lvl rad=$rad")
    val lhs = left.select(col("id").as("lid"), col("lat").as("llat"), col("lon").as("llon"))
      .withColumn("jcell", explode(cellDisk(cellEncode(col("llat"), col("llon"), lit(lvl)), lit(rad))))
    val rhs = right.select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon"),
      cellEncode(col("lat"), col("lon"), lit(lvl)).as("jcell"))
    val joined = lhs.join(rhs, Seq("jcell"))
    t("joined_count")(println("joined=" + joined.count()))
    val withDist = joined.withColumn("dist_km", haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon")))
    t("dist_filter_count")(println("inrad=" + withDist.filter(col("dist_km") <= maxKm).count()))
    t("noop_join_only")(withDist.filter(col("dist_km") <= maxKm).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
