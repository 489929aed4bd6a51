package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.query.Spatial
import graft.sources.Derived

/**
 * At-rest spatial layout: a bbox query over the tile-partitioned table must
 * return exactly the in-memory rangeSearch result, and the coarse-tile
 * predicate must prune at the directory level (PartitionFilters), not as a
 * post-scan filter.
 */
class SpatialStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("tiled range search: identical results, directory-level pruning") {
    val objs = Derived.objects(spark, Sf)
    val path = Files.createTempDirectory("graft_tiles_store").toString + "/objs"
    Spatial.tiledWrite(objs, path)

    val (latMin, lonMin, latMax, lonMax) = (-6.4, 106.6, -6.1, 107.0)
    val inMem = Spatial.rangeSearch(objs, latMin, lonMin, latMax, lonMax)
      .select("id").collect().map(_.getLong(0)).sorted
    val tiled = Spatial.rangeSearchTiled(spark, path, latMin, lonMin, latMax, lonMax)
    val fromDisk = tiled.select("id").collect().map(_.getLong(0)).sorted
    assert(fromDisk.nonEmpty, "bbox matched nothing — fixture bbox is wrong")
    assert(fromDisk.toSeq == inMem.toSeq)
    // schema parity: the synthetic tile partition column must not leak out
    assert(tiled.columns.sorted.toSeq == objs.columns.sorted.toSeq)

    // the tile predicate must be a PartitionFilter on the scan
    val plan = tiled.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("tile"), s"tile probe not a partition filter:\n$plan")

    // and the admitted tile set is a strict subset of the table's tiles
    val allTiles = new java.io.File(path).listFiles().count(_.getName.startsWith("tile="))
    val coverTiles = graft.core.Cells.coverBBox(
      latMin, lonMin, latMax, lonMax, Spatial.TileStoreLevel).length
    assert(coverTiles < allTiles,
      s"cover ($coverTiles tiles) does not prune ($allTiles total) — bbox too wide for the fixture")
  }
}
