package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.entry.SpatialQueries
import graft.query.Spatial

/** Phase-level timing of the north job at one parallelism level —
 *  diagnostic only. Usage: runMain graft.tools.NorthDiag <cpus> <inputPath> */
object NorthDiag {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val inputPath =
      if (args(1).startsWith("/tmp/graft-bench-input")) args(1)
      else graft.Bench.materializeInput(args(1), args(2).toLong)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // the bounded top-k udaf keeps ~1k groups per map task; the default
      // ObjectHashAggregate fallback threshold (128 groups) would silently
      // degrade it to sort-based agg over every candidate row
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); a
    }

    for (round <- Seq("warm", "timed")) {
      println(s"== $round (cpus=$cpus)")
      val objs = spark.read.parquet(inputPath)
        .withColumn("cell", graft.functions.GeoFunctions.cellEncode(
          col("lat"), col("lon"), graft.core.Cells.DefaultLevel))
      val total = time("count")(objs.count())
      time("tileagg")(objs.groupBy("cell").agg(count(lit(1))).agg(sum("count(1)")).head())
      time("pip")(Spatial.pipJoin(objs, SpatialQueries.Polygons.all).count())
      val qMod = math.max(1L, total / 1024)
      val queries = objs.filter(pmod(col("id"), lit(qMod)) === 0)
        .select(col("id").as("qid"), (col("lat") + 0.01).as("qlat"),
          (col("lon") - 0.01).as("qlon"))
      time("knn")(Spatial.knnJoin(objs, queries, k = 5).count())
    }
    // repeat knn alone: does it degrade with JVM-lifetime accumulation?
    val objs = spark.read.parquet(inputPath)
      .withColumn("cell", graft.functions.GeoFunctions.cellEncode(
        col("lat"), col("lon"), graft.core.Cells.DefaultLevel))
    val total = objs.count()
    val qMod = math.max(1L, total / 1024)
    val queries = objs.filter(pmod(col("id"), lit(qMod)) === 0)
      .select(col("id").as("qid"), (col("lat") + 0.01).as("qlat"),
        (col("lon") - 0.01).as("qlon"))
    for (i <- 1 to 2)
      time(s"knn_rep$i")(Spatial.knnJoin(objs, queries, k = 5).count())

    // micro-profile the knn internals: candidate join alone vs join+topk agg
    import graft.functions.GeoFunctions._
    val qCells = queries
      .withColumn("qcell", cellEncode(col("qlat"), col("qlon"), lit(graft.core.Cells.DefaultLevel)))
      .withColumn("cell", explode(cellDisk(col("qcell"), lit(1))))
    val joined = objs.join(broadcast(qCells), Seq("cell"))
      .withColumn("dist_km", haversineKm(col("qlat"), col("qlon"), col("lat"), col("lon")))
    time("knn_join")(joined.count())
    time("knn_join2")(joined.count())
    val agg = joined.groupBy(col("qid"))
      .agg(graft.functions.TopK.topKByDist(5)(col("dist_km"), col("id")).as("nn"))
    time("knn_agg")(agg.count())
    time("knn_agg2")(agg.count())

    // step-by-step round internals
    val topk0 = joined
      .groupBy(col("qid"), col("qlat"), col("qlon"))
      .agg(graft.functions.TopK.topKByDist(5)(col("dist_km"), col("id")).as("nn"))
      .select(col("qid"), col("qlat"), col("qlon"), posexplode(col("nn")))
      .select(col("qid"), col("qlat"), col("qlon"),
        col("col._2").as("id"), col("col._1").as("dist_km"),
        (col("pos") + 1).cast("int").as("rn"))
    val topk = time("st_ckpt")(topk0.localCheckpoint(true))
    val perQ = topk.groupBy(col("qid"), col("qlat"), col("qlon"))
      .agg(max(col("dist_km")).as("kth"), count(lit(1)).as("cnt"))
    val boundUdf = udf((qlat: Double, qlon: Double) =>
      graft.core.Cells.minDistOutsideDiskKm(qlat, qlon, graft.core.Cells.DefaultLevel, 1))
    val flags = perQ.withColumn("ok",
      col("cnt") >= 5 && col("kth") <= boundUdf(col("qlat"), col("qlon")))
    val okIds = flags.filter(col("ok")).select("qid")
    val done = topk.join(broadcast(okIds), Seq("qid"), "left_semi")
      .select(col("qid"), col("id"), col("dist_km"), col("rn"))
    val acc = time("st_acc")(done.localCheckpoint(true))
    val pending2 = time("st_pend")(
      queries.join(broadcast(flags.filter(!col("ok")).select("qid")), Seq("qid"), "left_semi")
        .localCheckpoint(true))
    time("st_empty")(pending2.isEmpty)
    time("st_count")(acc.count())
    spark.stop()
  }
}
