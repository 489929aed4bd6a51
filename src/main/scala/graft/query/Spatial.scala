package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Cells
import graft.functions.GeoFunctions._

/**
 * Spatial query operators over a cell-indexed point table
 * (columns: id, lat, lon, [feature], cell).
 *
 * Re-expresses the reference's R-tree operators
 * (/root/reference/pkg/datastructure/rtree.go):
 *  - incremental nearest-neighbour (rtree.go:685-723)  -> ring-expansion
 *    join with a distance lower-bound stop test ([[Cells.minDistOutsideDiskKm]])
 *  - radius + OSM-feature filter kNN (rtree.go:656-682) -> same with
 *    predicate before limit
 *  - range/bbox search (rtree.go:505-531)              -> cell-cover equi-join
 *  - nearest-street join (indexer.go:986-1026)         -> cell-prefilter +
 *    min_by refine join
 *  - region PIP join (indexer.go:1035-1061)            -> broadcast polygon
 *    cell cover + exact winding-number refine
 *
 * Scale design: the point table is assumed partitioned/sorted by `cell`
 * (see pipeline.TableIO), so the `isin(diskCells)` filters prune partitions
 * and row groups; each ring iteration touches only the cells it names. The
 * per-query-point batch variant shuffles once on `cell` and resolves
 * unconverged queries in driver-side rounds over a shrinking subset.
 */
object Spatial {

  case class Polygon(id: Long, name: String, lats: Array[Double], lons: Array[Double])

  /** Single-point exact kNN via ring expansion. Returns (id, lat, lon,
   *  feature?, dist_km) of the k nearest, ordered by (dist, id).
   *
   *  Exactness: after scanning disk(r), any unscanned point is farther than
   *  `minDistOutsideDiskKm(r)`; once the kth collected distance is below
   *  that bound the result set equals the R-tree's exact incremental-NN
   *  output (rtree_test.go:281-290 parity is asserted in KnnSpec). */
  def knn(points: DataFrame, lat: Double, lon: Double, k: Int,
          level: Int = Cells.DefaultLevel,
          radiusKm: Option[Double] = None,
          feature: Option[String] = None,
          offset: Int = 0): DataFrame = {
    val spark = points.sparkSession
    val qCell = Cells.encode(lat, lon, level)
    val dist = haversineKm(lit(lat), lit(lon), col("lat"), col("lon"))

    // radius queries: one shot over the circle's cell cover
    radiusKm match {
      case Some(r) =>
        val cells = Cells.coverCircle(lat, lon, r, level)
        var out = points
          .filter(col("cell").isin(cells.map(java.lang.Long.valueOf): _*))
          .withColumn("dist_km", dist)
          .filter(col("dist_km") <= r)
        feature.foreach(f => out = out.filter(col("feature") === f))
        return out.orderBy(col("dist_km"), col("id"))
          .limit(k + offset).offset(offset)
      case None =>
    }

    // pure kNN: grow the disk until the kth distance is provably exact
    var r = 1
    var result: Array[org.apache.spark.sql.Row] = Array.empty
    var done = false
    val maxR = (1 << math.min(level, 12)) // full globe fallback guard
    while (!done) {
      val cells = Cells.disk(qCell, r)
      var cand = points.filter(col("cell").isin(cells.map(java.lang.Long.valueOf): _*))
      feature.foreach(f => cand = cand.filter(col("feature") === f))
      result = cand.withColumn("dist_km", dist)
        .orderBy(col("dist_km"), col("id"))
        .limit(k + offset)
        .collect()
      val bound = Cells.minDistOutsideDiskKm(lat, lon, level, r)
      done = r >= maxR ||
        (result.length >= k + offset && result.last.getAs[Double]("dist_km") <= bound)
      if (!done) r = math.max(r + 1, r * 2)
    }
    val schema = points.withColumn("dist_km", dist).schema
    spark.createDataFrame(
      spark.sparkContext.parallelize(result.drop(offset).toIndexedSeq, 1), schema)
  }

  /**
   * Batch kNN join: for EVERY query row (qid, qlat, qlon) find its k nearest
   * points. One shuffle on `cell`; per-query convergence is checked with the
   * same lower bound and unconverged queries are retried with a wider disk
   * (driver rounds over the shrinking unconverged subset — at most
   * log(maxR) rounds).
   */
  def knnJoin(points: DataFrame, queries: DataFrame, k: Int,
              level: Int = Cells.DefaultLevel, initialR: Int = 1,
              maxRounds: Int = 8): DataFrame = {
    val spark = points.sparkSession
    // materialize the (small, by contract) query side once — it may derive
    // from a full scan of the point table, and each round references it
    // several times (broadcast build + semi-join narrowing)
    var pending = queries.select(col("qid"), col("qlat"), col("qlon"))
      .localCheckpoint(eager = true)
    var acc: Option[DataFrame] = None
    var r = initialR
    var round = 0
    val debug = spark.conf.getOption("spark.graft.knn.debug").contains("true")
    while (round < maxRounds && !pending.isEmpty) {
      if (debug) println(s"knnJoin round=$round r=$r pending=${pending.count()}")
      val qCells = pending
        .withColumn("qcell", cellEncode(col("qlat"), col("qlon"), lit(level)))
        .withColumn("cell", explode(cellDisk(col("qcell"), lit(r))))
      // the query side is small relative to the point table: broadcast it
      val joined = points.join(broadcast(qCells), Seq("cell"))
        .withColumn("dist_km", haversineKm(col("qlat"), col("qlon"), col("lat"), col("lon")))
      // bounded top-k aggregate (map-side combine): each map task ships at
      // most k rows per query instead of every candidate in the cell disk —
      // see graft.functions.TopK. Materialized ONCE per round (≤ k rows per
      // pending query); the flags/done/pending splits below would otherwise
      // re-execute the whole join subtree three times.
      val topk = joined
        .groupBy(col("qid"), col("qlat"), col("qlon"))
        .agg(graft.functions.TopK.topKByDist(k)(col("dist_km"), col("id")).as("nn"))
        .select(col("qid"), col("qlat"), col("qlon"), posexplode(col("nn")))
        .select(col("qid"), col("qlat"), col("qlon"),
          col("col._2").as("id"), col("col._1").as("dist_km"),
          (col("pos") + 1).cast("int").as("rn"))
        .localCheckpoint(eager = true)
      // convergence: kth distance within the provable bound for this r
      val perQ = topk.groupBy(col("qid"), col("qlat"), col("qlon"))
        .agg(max(col("dist_km")).as("kth"), count(lit(1)).as("cnt"))
      val boundUdf = udf((qlat: Double, qlon: Double) =>
        Cells.minDistOutsideDiskKm(qlat, qlon, level, r))
      val flags = perQ.withColumn("ok",
        col("cnt") >= k && col("kth") <= boundUdf(col("qlat"), col("qlon")))
      val okIds = flags.filter(col("ok")).select("qid")
      val done = topk.join(broadcast(okIds), Seq("qid"), "left_semi")
        .select(col("qid"), col("id"), col("dist_km"), col("rn"))
      // topk is already checkpointed, so the accumulated union stays flat
      acc = Some(acc.map(_.unionByName(done)).getOrElse(done))
      pending = pending.join(broadcast(flags.filter(!col("ok")).select("qid")),
          Seq("qid"), "left_semi")
        .localCheckpoint(eager = true)
      r *= 2
      round += 1
    }
    acc.getOrElse(spark.emptyDataFrame)
  }

  /** Range (bbox) search — R-tree Search equivalent (rtree.go:505-531). */
  def rangeSearch(points: DataFrame, latMin: Double, lonMin: Double,
                  latMax: Double, lonMax: Double,
                  level: Int = Cells.DefaultLevel): DataFrame = {
    val cells = Cells.coverBBox(latMin, lonMin, latMax, lonMax, level)
    points.filter(col("cell").isin(cells.map(java.lang.Long.valueOf): _*))
      .filter(col("lat") >= latMin && col("lat") <= latMax &&
        col("lon") >= lonMin && col("lon") <= lonMax)
  }

  /**
   * Nearest-neighbour enrichment join (reference GetFullAdress,
   * indexer.go:986-1026): for every left point, the nearest right point
   * within `maxKm`. Both sides are expanded/keyed by cell so the theta-join
   * becomes an equi-join; refine keeps min_by(dist).
   */
  def nearestJoin(left: DataFrame, right: DataFrame, maxKm: Double,
                  level: Int = Cells.DefaultLevel): DataFrame = {
    // ring radius that guarantees covering maxKm at this level anywhere in
    // the data's latitude band
    val l = left.select(min(col("lat")), max(col("lat"))).head()
    val maxAbsLat = math.max(math.abs(l.getDouble(0)), math.abs(l.getDouble(1)))
    val wKm = Cells.cellWidthKm(maxAbsLat, level)
    val hKm = Cells.cellHeightKm(level)
    val r = math.max(1, math.ceil(maxKm / math.min(wKm, hKm)).toInt)
    val lhs = left.select(col("id").as("lid"), col("lat").as("llat"), col("lon").as("llon"),
        col("cell"))
      .withColumn("jcell", explode(cellDisk(col("cell"), lit(r))))
    val rhs = right.select(col("id").as("rid"), col("lat").as("rlat"), col("lon").as("rlon"),
      col("cell").as("jcell"))
    lhs.join(rhs, Seq("jcell"))
      .withColumn("dist_km", haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon")))
      .filter(col("dist_km") <= maxKm)
      .groupBy(col("lid"), col("llat"), col("llon"))
      .agg(min_by(struct(col("rid"), col("dist_km")), struct(col("dist_km"), col("rid"))).as("nn"))
      .select(col("lid"), col("nn.rid").as("rid"), col("nn.dist_km").as("dist_km"))
  }

  /**
   * Point-in-polygon join (reference region enrichment, indexer.go:1035-1061):
   * broadcast cell-prefilter (conservative polygon cover) + exact
   * winding-number refine. Returns (id, poly_id, poly_name).
   */
  def pipJoin(points: DataFrame, polygons: Seq[Polygon],
              level: Int = Cells.DefaultLevel): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cover = polygons.flatMap(p =>
      Cells.coverPolygon(p.lats, p.lons, level).map(c => (c, p.id))).toDF("cell", "poly_id")
    val polys = polygons.map(p => (p.id, p.name, p.lats.toSeq, p.lons.toSeq))
      .toDF("poly_id", "poly_name", "plats", "plons")
    points.join(broadcast(cover), Seq("cell"))
      .join(broadcast(polys), Seq("poly_id"))
      .filter(pointInPolygon(col("lat"), col("lon"), col("plats"), col("plons")))
      .select(col("id"), col("poly_id"), col("poly_name"))
  }

  /**
   * Reverse geocode (reference searcher.go:402-435): nearest object within
   * 0.35 km of each query point — a k=1 [[knnJoin]] with a radius cap.
   */
  def reverseGeocode(points: DataFrame, queries: DataFrame,
                     level: Int = Cells.DefaultLevel, capKm: Double = 0.35): DataFrame =
    knnJoin(points, queries, k = 1, level = level)
      .filter(col("dist_km") <= capKm)
      .select(col("qid"), col("id"), col("dist_km"))
}
