package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Cells
import graft.functions.GeoFunctions

/**
 * Raster ↔ vector conversion over the cell grid (BASELINE.json north_rule:
 * "H3/S2 index, point-in-polygon, kNN, raster↔vector").
 *
 *  - [[rasterize]]: points → a sparse raster — one row per occupied grid
 *    cell at `level`, carrying (x, y, value). The grid coordinates are the
 *    cell's own (x, y) indices, so the raster aligns exactly with the tile
 *    index; pure groupBy, one shuffle, map-side combined.
 *  - [[vectorize]]: raster → vector features — 4-connected components of
 *    the cells with value ≥ threshold, each labeled with its component id
 *    (the minimum cellId in the component, deterministic) and emitted as
 *    (component, cell, x, y, value) plus per-component bbox polygons from
 *    [[componentBounds]]. Connectivity is resolved by distributed
 *    min-label propagation: each iteration joins the frontier with the
 *    4-neighbor edge set and takes the min label; iterations are
 *    O(diameter) with each round a single shuffle — the standard
 *    connected-components-on-Spark shape, no driver-side graph.
 */
object Raster {

  /** Sparse raster of per-cell aggregates: (cell, x, y, value=count). */
  def rasterize(points: DataFrame, level: Int = Cells.DefaultLevel): DataFrame = {
    val xUdf = udf((c: Long) => Cells.x(c))
    val yUdf = udf((c: Long) => Cells.y(c))
    points
      .withColumn("rcell", GeoFunctions.cellEncode(col("lat"), col("lon"), level))
      .groupBy(col("rcell").as("cell"))
      .agg(count(lit(1)).as("value"))
      .select(col("cell"), xUdf(col("cell")).as("x"), yUdf(col("cell")).as("y"),
        col("value"))
  }

  /**
   * 4-connected components of raster cells with value >= threshold.
   * Returns (component, cell, x, y, value); `component` = min cellId in
   * the component.
   */
  def vectorize(raster: DataFrame, threshold: Long, maxIters: Int = 256): DataFrame = {
    val debug0 = raster.sparkSession.conf
      .getOption("spark.graft.raster.debug").contains("true")
    val tc0 = System.nanoTime()
    val cells = raster.filter(col("value") >= threshold)
      .select(col("cell"), col("x"), col("y"), col("value"))
      .localCheckpoint(eager = true)
    if (debug0) println(f"vectorize cells ckpt ${(System.nanoTime() - tc0) / 1e9}%.2f s")

    // undirected 4-neighbor edges, built by equi-joining on shifted grid
    // coordinates (no theta join): right/down neighbors, then symmetrized
    val a = cells.select(col("cell").as("c1"), col("x"), col("y"))
    val b = cells.select(col("cell").as("c2"), col("x").as("bx"), col("y").as("by"))
    val right = a.join(b, col("bx") === col("x") + 1 && col("by") === col("y"))
    val down = a.join(b, col("bx") === col("x") && col("by") === col("y") + 1)
    val edges = right.unionByName(down)
      .select(col("c1"), col("c2"))
    val ts0 = System.nanoTime()
    val sym = edges.unionByName(edges.select(col("c2").as("c1"), col("c1").as("c2")))
      .localCheckpoint(eager = true)
    if (debug0) println(f"vectorize sym ckpt ${(System.nanoTime() - ts0) / 1e9}%.2f s")

    // min-label propagation with pointer jumping: each round takes the min
    // over 4-neighbor labels, then compresses label -> label-of-label
    // (labels are always member cellIds, so the self-join is well-defined).
    // Jumping compresses chains quickly, but worst-case rounds are still
    // bounded by the component diameter (the min must be DISCOVERED by
    // neighbor hops before pointers can shortcut to it), hence the generous
    // maxIters; each round is a single cheap shuffle over the thresholded
    // cells only. For planetary-diameter components the upgrade path is the
    // large-star/small-star algorithm (Kiveris et al.), same DataFrame ops.
    // Materialization note — every iterative-DataFrame pitfall at once:
    //  * localCheckpoint flattens the plan but COPIES the parent's
    //    sizeInBytes statistic, so the two joins per round compound it —
    //    the BigInt doubles in bit-length each round and by round ~20 the
    //    driver spends minutes in BigInteger.multiply (measured: 250 s for
    //    round 23).
    //  * persist() keeps real stats but keeps the whole child PLAN — the
    //    tree deepens every round and AQE burns the driver in
    //    generateTreeString for listener events.
    // materializeRound crosses the RDD boundary instead: a flat LogicalRDD
    // (constant-size plan) with constant default stats, persisted so the
    // next round reads memory, lineage truncated each round.
    val spark = raster.sparkSession
    var roundRdds = List.empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def materializeRound(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      roundRdds = rdd :: roundRdds
      spark.createDataFrame(rdd, df.schema)
    }
    var labels = materializeRound(cells.select(col("cell"), col("cell").as("label")))
    var changedCount = 1L
    var iter = 0
    val debug = spark.conf.getOption("spark.graft.raster.debug").contains("true")
    while (changedCount > 0 && iter < maxIters) {
      val t0 = System.nanoTime()
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("cell", "c2").withColumnRenamed("label", "nlabel"), Seq("c2"))
        .groupBy(col("c1").as("cell")).agg(min(col("nlabel")).as("nmin"))
      // neighbor-min step; pointer jump joins a DISTINCTLY-named copy (a
      // same-name self-join resolves ambiguously — both "label" attributes
      // share lineage); the changed flag rides along in the same plan
      val stepped = materializeRound(
        labels.join(viaNeighbor, Seq("cell"), "left_outer")
          .select(col("cell"), col("label").as("old"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label")))
      val parents = stepped.select(col("cell").as("pcell"), col("label").as("plabel"))
      val next = materializeRound(
        stepped.join(parents, col("label") === col("pcell"), "left_outer")
          .select(col("cell"),
            least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
            (least(col("label"), coalesce(col("plabel"), col("label"))) =!= col("old")).as("changed")))
      changedCount = next.filter(col("changed")).count()
      labels = next.select(col("cell"), col("label"))
      // free everything except the RDD labels now depends on
      val keep = roundRdds.head
      roundRdds.tail.foreach(_.unpersist(blocking = false))
      roundRdds = List(keep)
      iter += 1
      if (debug)
        println(f"vectorize iter=$iter changed=$changedCount wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    cells.join(labels, Seq("cell"))
      .select(col("label").as("component"), col("cell"), col("x"), col("y"), col("value"))
  }

  /** Vector features: per-component bbox polygon (lat/lon ring) + stats. */
  def componentBounds(components: DataFrame): DataFrame = {
    val boundsUdf = udf((c: Long) => {
      val (latMin, lonMin, latMax, lonMax) = Cells.bounds(c)
      Array(latMin, lonMin, latMax, lonMax)
    })
    components
      .withColumn("b", boundsUdf(col("cell")))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_cells"), sum(col("value")).as("total"),
        min(col("b")(0)).as("lat_min"), min(col("b")(1)).as("lon_min"),
        max(col("b")(2)).as("lat_max"), max(col("b")(3)).as("lon_max"))
  }
}
