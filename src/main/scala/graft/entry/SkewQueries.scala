package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.pipeline.Skew
import graft.sources.Derived

/**
 * Skew-machinery queries (north_rule: salted repartitioning + adaptive
 * cell-level splitting), each with a DuckDB oracle twin proving the
 * skew-safe plan computes the SAME result as the naive plan.
 *
 * These run at a coarse base level (8) so tiles in the derived region
 * actually exceed the split threshold at test scale — at level 8 the
 * Java-island region spans only ~15 tiles, giving realistic dense-tile
 * counts.
 */
object SkewQueries {
  val BaseLevel = 8
  val Threshold = 200L

  private def objects(s: SparkSession, dir: String) =
    Derived.objects(s, dir, level = BaseLevel)

  private val xUdf = GeoFunctions.cellX _
  private val yUdf = GeoFunctions.cellY _

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G3: adaptive cell splitting, one refinement round — overfull level-8
    // tiles re-encode their rows at level 9
    "g3_adaptive_cells" -> ((s, dir) =>
      Skew.adaptiveCells(objects(s, dir), Threshold,
          baseLevel = BaseLevel, maxLevel = BaseLevel + 1)
        .select(col("id"), xUdf(col("acell")).as("tx"), yUdf(col("acell")).as("ty"),
          col("alevel").cast("long").as("lvl"))
        .orderBy(col("id"))),

    // G4: salted two-phase holistic aggregation == naive per-tile count
    "g4_salted_agg" -> ((s, dir) =>
      Skew.saltedAgg(objects(s, dir), "cell", "id", salts = 8)(
          count(lit(1)), partials => sum(partials))
        .select(xUdf(col("cell")).as("tx"), yUdf(col("cell")).as("ty"),
          col("agg").cast("long").as("n"))
        .orderBy(col("tx"), col("ty"))),

    // G5: salted broadcast join == plain equi join (hot-key spreading)
    "g5_salted_join" -> ((s, dir) => {
      import s.implicits._
      val dim = (0 to 6).map(i => (s"f$i", (i + 1) * 1.5)).toDF("feature", "weight")
      Skew.saltedJoin(objects(s, dir).filter(col("id") % 23 === 0), dim,
          key = "feature", bigIdCol = "id", salts = 8)
        .select(col("id"), col("feature"), Derived.q4(col("weight")).as("weight4"))
        .orderBy(col("id"))
    })
  )

  private def txSql(level: Int) = {
    val n = 1L << level
    s"CAST(least(greatest(floor((lon + 180.0) / 360.0 * $n), 0), ${n - 1}) AS BIGINT)"
  }
  private def tySql(level: Int) = {
    val n = 1L << level
    s"CAST(least(greatest(floor((lat + 90.0) / 180.0 * $n), 0), ${n - 1}) AS BIGINT)"
  }

  val oracles: Map[String, String] = Map(
    "g3_adaptive_cells" ->
      s"""WITH ${Derived.objectsSqlCte},
         |base AS (
         |  SELECT id, lat, lon, ${txSql(BaseLevel)} AS tx0, ${tySql(BaseLevel)} AS ty0
         |  FROM objects),
         |cnt AS (
         |  SELECT *, count(*) OVER (PARTITION BY tx0, ty0) AS n FROM base)
         |SELECT id,
         |  CASE WHEN n > $Threshold THEN ${txSql(BaseLevel + 1)} ELSE tx0 END AS tx,
         |  CASE WHEN n > $Threshold THEN ${tySql(BaseLevel + 1)} ELSE ty0 END AS ty,
         |  CAST(CASE WHEN n > $Threshold THEN ${BaseLevel + 1} ELSE $BaseLevel END AS BIGINT) AS lvl
         |FROM cnt ORDER BY id""".stripMargin,

    "g4_salted_agg" ->
      s"""WITH ${Derived.objectsSqlCte}
         |SELECT ${txSql(BaseLevel)} AS tx, ${tySql(BaseLevel)} AS ty, count(*) AS n
         |FROM objects GROUP BY 1, 2 ORDER BY tx, ty""".stripMargin,

    "g5_salted_join" ->
      s"""WITH ${Derived.objectsSqlCte},
         |dim AS (${(0 to 6).map(i => s"SELECT 'f$i' AS feature, ${(i + 1) * 1.5} AS weight")
            .mkString(" UNION ALL ")})
         |SELECT o.id, o.feature, ${Derived.q4Sql("d.weight")} AS weight4
         |FROM objects o JOIN dim d ON o.feature = d.feature
         |WHERE o.id % 23 = 0 ORDER BY o.id""".stripMargin
  )
}
