package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Cells
import graft.query.Raster

/** Raster↔vector: rasterize equals per-cell counts; vectorize finds exactly
 *  the 4-connected components (golden fixture + partition properties). */
class RasterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  val level = 10

  test("rasterize: one row per occupied cell with exact counts") {
    val pts = Seq((1L, -7.0, 107.0), (2L, -7.0, 107.0), (3L, -6.5, 108.5))
      .toDF("id", "lat", "lon")
    val r = Raster.rasterize(pts, level).collect()
    assert(r.length == 2)
    val byCell = r.map(row => row.getAs[Long]("cell") -> row.getAs[Long]("value")).toMap
    assert(byCell(Cells.encode(-7.0, 107.0, level)) == 2L)
    assert(byCell(Cells.encode(-6.5, 108.5, level)) == 1L)
    val row = r.find(_.getAs[Long]("value") == 2).get
    assert(row.getAs[Long]("x") == Cells.x(Cells.encode(-7.0, 107.0, level)))
    assert(row.getAs[Long]("y") == Cells.y(Cells.encode(-7.0, 107.0, level)))
  }

  test("vectorize: golden L-shape plus isolated cell = 2 components") {
    // grid cells: L-shape {(0,0),(1,0),(1,1),(1,2)} + isolated (5,5),
    // expressed directly as a raster
    def mk(x: Long, y: Long) = (Cells.fromXY(x, y, level), x, y, 10L)
    val raster = Seq(mk(100, 200), mk(101, 200), mk(101, 201), mk(101, 202), mk(105, 205))
      .toDF("cell", "x", "y", "value")
    val comps = Raster.vectorize(raster, threshold = 1).collect()
    val byComp = comps.groupBy(_.getAs[Long]("component")).view.mapValues(
      _.map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet).toMap
    assert(byComp.size == 2)
    assert(byComp.values.toSet == Set(
      Set((100L, 200L), (101L, 200L), (101L, 201L), (101L, 202L)),
      Set((105L, 205L))))
    // deterministic component ids: the min cellId of each component
    for ((label, cells) <- byComp) {
      val minCell = cells.map { case (x, y) => Cells.fromXY(x, y, level) }.min
      assert(label == minCell)
    }
  }

  test("vectorize on real data: components partition cells; cross-component cells are never adjacent") {
    val pts = sources(spark)
    val raster = Raster.rasterize(pts, level)
    val comps = Raster.vectorize(raster, threshold = 5).cache()
    val thresholded = raster.filter(col("value") >= 5)
    assert(comps.count() == thresholded.count(), "components must partition the cells")
    // adjacent cells always share a component
    val adj = comps.alias("a").join(comps.alias("b"),
      (abs(col("a.x") - col("b.x")) + abs(col("a.y") - col("b.y"))) === 1)
    val crossPairs = adj.filter(col("a.component") =!= col("b.component")).count()
    assert(crossPairs == 0, "adjacent cells ended in different components")
    // per-component bounds are consistent
    val bounds = Raster.componentBounds(comps).collect()
    assert(bounds.forall(r => r.getAs[Double]("lat_max") >= r.getAs[Double]("lat_min")))
    assert(bounds.map(_.getAs[Long]("n_cells")).sum == comps.count())
  }

  private def sources(s: org.apache.spark.sql.SparkSession) =
    graft.sources.Derived.objects(s, Sf).select("id", "lat", "lon")

  test("vectorize converges on a long serpentine chain (diameter > default iters)") {
    val chain = (0L until 60L).map(i => (Cells.fromXY(50 + i, 300, level), 50 + i, 300L, 1L))
    val raster = chain.toDF("cell", "x", "y", "value")
    val comps = Raster.vectorize(raster, threshold = 1)
    assert(comps.select("component").distinct().count() == 1, "chain split into pieces")
  }
}
