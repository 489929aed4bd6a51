package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.query.Raster
import graft.sources.Derived

/**
 * Raster↔vector queries (north_rule: "H3/S2 index, point-in-polygon, kNN,
 * raster↔vector"). The vectorize oracle computes 4-connected components in
 * DuckDB via a recursive transitive-closure CTE — an independent algorithm
 * (closure + min-reachable) cross-checking the Spark side's distributed
 * min-label propagation with pointer jumping.
 */
object RasterQueries {
  val Level = 10
  val N = 1L << Level

  /** Data-derived density threshold: 1.12 × the mean per-cell count,
   *  computed with the SAME integer arithmetic on both engines
   *  (`ceil` via (num + den - 1) integer division) so the query stays
   *  oracle-comparable at every scale factor. */
  def threshold(total: Long, ncell: Long): Long =
    (112L * total + 100L * ncell - 1L) / (100L * ncell)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G6: vector -> raster (per-cell density grid)
    "g6_rasterize" -> ((s, dir) =>
      Raster.rasterize(Derived.objects(s, dir), Level)
        .select(col("x"), col("y"), col("value"))
        .orderBy(col("x"), col("y"))),

    // G7: raster -> vector (4-connected components of dense cells);
    // component id re-keyed to min(y*N + x) so both engines agree without
    // sharing the cellId bit layout
    "g7_vectorize" -> ((s, dir) => {
      val raster = Raster.rasterize(Derived.objects(s, dir), Level)
      val st = raster.agg(sum(col("value")), count(lit(1))).head()
      val comps = Raster.vectorize(raster, threshold(st.getLong(0), st.getLong(1)))
      comps
        .withColumn("comp",
          min(col("y") * N + col("x")).over(Window.partitionBy(col("component"))))
        .select(col("comp"), col("x"), col("y"), col("value"))
        .orderBy(col("x"), col("y"))
    })
  )

  private def txSql = {
    s"CAST(least(greatest(floor((lon + 180.0) / 360.0 * $N), 0), ${N - 1}) AS BIGINT)"
  }
  private def tySql = {
    s"CAST(least(greatest(floor((lat + 90.0) / 180.0 * $N), 0), ${N - 1}) AS BIGINT)"
  }

  val oracles: Map[String, String] = Map(
    "g6_rasterize" ->
      s"""WITH ${Derived.objectsSqlCte}
         |SELECT $txSql AS x, $tySql AS y, count(*) AS value
         |FROM objects GROUP BY 1, 2 ORDER BY x, y""".stripMargin,

    "g7_vectorize" ->
      s"""WITH RECURSIVE ${Derived.objectsSqlCte},
         |allcells AS (
         |  SELECT $txSql AS x, $tySql AS y, count(*) AS v
         |  FROM objects GROUP BY 1, 2),
         |thr AS (SELECT (112 * SUM(v) + 100 * COUNT(*) - 1) // (100 * COUNT(*)) AS t
         |        FROM allcells),
         |cells AS (SELECT * FROM allcells WHERE v >= (SELECT t FROM thr)),
         |idx AS (SELECT x, y, v, y * $N + x AS lin FROM cells),
         |edges AS (SELECT a.lin AS l1, b.lin AS l2 FROM idx a JOIN idx b
         |          ON abs(a.x - b.x) + abs(a.y - b.y) = 1),
         |reach(lin, r) AS (
         |  SELECT lin, lin FROM idx
         |  UNION
         |  SELECT e.l1, reach.r FROM edges e JOIN reach ON e.l2 = reach.lin),
         |comp AS (SELECT lin, MIN(r) AS comp FROM reach GROUP BY lin)
         |SELECT c.comp, i.x, i.y, i.v AS value
         |FROM idx i JOIN comp c USING (lin) ORDER BY i.x, i.y""".stripMargin
  )
}
