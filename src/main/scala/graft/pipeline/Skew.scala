package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Cells
import graft.functions.GeoFunctions

/**
 * Skew handling for dense tiles (BASELINE.json north_rule: "Skew from dense
 * tiles is handled with salted repartitioning and adaptive cell-level
 * splitting").
 *
 * Two independent mechanisms, composable:
 *
 *  1. [[adaptiveCells]] — cells whose row count exceeds a threshold are
 *     re-encoded at progressively finer levels (quadtree children via
 *     [[Cells.encode]] at level+1) until every adaptive cell is under the
 *     threshold or `maxLevel` is reached. This bounds the per-key group size
 *     for any downstream cell-keyed groupBy/join, which is what actually
 *     kills a 1000-executor job on a Jakarta-density tile. The overfull-cell
 *     set per round is an AGGREGATE (≤ totalRows / maxRowsPerCell entries —
 *     at 10^12 rows and a 10^6 threshold that is ≤10^6 rows), so it is
 *     broadcastable by construction; data rows never collect to the driver.
 *
 *  2. [[saltedJoin]] / [[saltedAgg]] — when the key distribution cannot be
 *     changed (e.g. joining per-cell against a prefilter table), the hot
 *     side is salted into `salts` sub-keys and the small side is exploded
 *     ×salts, turning one straggler reducer into `salts` even ones. For
 *     algebraic aggregates Spark's partial aggregation already handles
 *     skew; [[saltedAgg]] exists for holistic aggregates (collect_list /
 *     collect_set posting-list building) where the single final reducer
 *     for a hot term/cell would otherwise OOM.
 *
 * The reference has no counterpart (single-process R-tree,
 * /root/reference/pkg/datastructure/rtree.go); this is scale-out-only
 * machinery.
 */
object Skew {

  /**
   * Adaptive cell-level splitting. Input must carry (lat, lon, cell) with
   * `cell` at `baseLevel`. Output adds:
   *   - `acell`  : the adaptive cell id (level encoded in the low bits, as
   *                everywhere in [[Cells]])
   *   - `alevel` : the level `acell` is encoded at
   * Deterministic: depends only on the data and the threshold, never on
   * partitioning or arrival order.
   */
  def adaptiveCells(points: DataFrame, maxRowsPerCell: Long,
                    baseLevel: Int = Cells.DefaultLevel,
                    maxLevel: Int = 24): DataFrame = {
    var out = points
      .withColumn("acell", col("cell"))
      .withColumn("alevel", lit(baseLevel))
    var lvl = baseLevel
    var anyOver = true
    while (lvl < maxLevel && anyOver) {
      // overfull cells AT THE CURRENT FINEST LEVEL only — cells already
      // split in an earlier round re-qualify iff a child is still overfull
      val over = out.filter(col("alevel") === lvl)
        .groupBy(col("acell")).agg(count(lit(1)).as("n"))
        .filter(col("n") > maxRowsPerCell)
        .select(col("acell").as("overcell"))
      anyOver = !over.isEmpty
      if (anyOver) {
        out = out
          .join(broadcast(over), out("acell") === over("overcell"), "left_outer")
          .withColumn("acell",
            when(col("overcell").isNotNull,
              GeoFunctions.cellEncode(col("lat"), col("lon"), lvl + 1))
              .otherwise(col("acell")))
          .withColumn("alevel",
            when(col("overcell").isNotNull, lit(lvl + 1)).otherwise(col("alevel")))
          .drop("overcell")
          // cut the growing lineage so round N+1 plans stay flat
          .localCheckpoint(eager = true)
        lvl += 1
      }
    }
    out
  }

  /** Salt expression: stable per-row, uniform over [0, salts). */
  def saltOf(idCol: Column, salts: Int): Column = pmod(xxhash64(idCol), lit(salts))

  /**
   * Skew-safe equi-join of a large skewed table against a SMALL table on
   * `key`: the big side gains a salt from `bigIdCol`, the small side is
   * exploded ×salts, and the join key becomes (key, salt) — the hot key's
   * rows now land on `salts` reducers instead of one. The small side stays
   * broadcast (it grows only ×salts).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigIdCol: String, salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("_salt", saltOf(col(bigIdCol), salts))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    b.join(broadcast(s), Seq(key, "_salt"), joinType).drop("_salt")
  }

  /**
   * Two-phase holistic aggregation: phase 1 groups by (key, salt) and
   * applies `partial` to bound any single reducer's input; phase 2 groups
   * by key and applies `merge` over the ≤`salts` partial rows. Used for
   * posting-list building where collect_list on a hot term would
   * otherwise funnel the whole term through one task.
   */
  def saltedAgg(df: DataFrame, key: String, idCol: String, salts: Int)
               (partial: Column, merge: Column => Column): DataFrame = {
    df.withColumn("_salt", saltOf(col(idCol), salts))
      .groupBy(col(key), col("_salt"))
      .agg(partial.as("_partial"))
      .groupBy(col(key))
      .agg(merge(col("_partial")).as("agg"))
  }

  /**
   * Salted repartitioning: spread rows evenly over `numPartitions` while
   * keeping same-cell rows in at most `salts` partitions (locality for the
   * subsequent cell join, without one dense tile owning a whole partition).
   */
  def repartitionSaltedByCell(df: DataFrame, numPartitions: Int,
                              idCol: String = "id", salts: Int = 4): DataFrame =
    df.repartition(numPartitions, col("cell"), saltOf(col(idCol), salts))
}
