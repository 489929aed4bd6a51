package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.Spatial
import graft.sources.Derived

/** Stage breakdown of j2_nearest_join (optimization diagnostics). */
object J2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"J2PROBE $label%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val o = Derived.objects(spark, sfDir)
    o.count() // warm
    val left = o.filter(col("id") % 11 === 0 && col("id") % 5 =!= 0)
    val right = o.filter(col("id") % 5 === 0)
    for (rep <- 1 to 2) {
      t(s"objects_noop_$rep")(o.write.format("noop").mode("overwrite").save())
      t(s"left_minmax_$rep")(left.select(min(col("lat")), max(col("lat"))).head())
      t(s"nearest_noop_$rep")(Spatial.nearestJoin(left, right, maxKm = 30.0)
        .write.format("noop").mode("overwrite").save())
      t(s"full_$rep")(Spatial.nearestJoin(left, right, maxKm = 30.0)
        .select(col("lid"), col("rid"), Derived.q4(col("dist_km")).as("dist4"))
        .orderBy(col("lid")).count())
    }
    spark.stop()
  }
}
