package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Cells
import graft.pipeline.Skew
import graft.sources.Derived

/** Skew machinery is result-transparent: every skew-safe plan must compute
 *  exactly what the naive plan computes (north_rule: salted repartitioning +
 *  adaptive cell-level splitting). */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val objs = Derived.objects(spark, Sf, level = 8).cache()

  test("adaptiveCells: every adaptive cell is under the threshold or at maxLevel") {
    val thr = 100L
    val out = Skew.adaptiveCells(objs, thr, baseLevel = 8, maxLevel = 12)
    val over = out.groupBy("acell", "alevel").count()
      .filter(col("count") > thr && col("alevel") < 12)
    assert(over.isEmpty, "an overfull cell below maxLevel survived splitting")
    // split actually happened at this scale (1500 rows over ~15 level-8 tiles)
    assert(out.filter(col("alevel") > 8).count() > 0)
  }

  test("adaptiveCells: acell is always the point's own cell at alevel (no row misassigned)") {
    val out = Skew.adaptiveCells(objs, 100L, baseLevel = 8, maxLevel = 12)
    val bad = out.filter(
      col("acell") =!= udf((lat: Double, lon: Double, l: Int) => Cells.encode(lat, lon, l))
        .apply(col("lat"), col("lon"), col("alevel")))
    assert(bad.isEmpty)
  }

  test("adaptiveCells: rows and ids are preserved exactly") {
    val out = Skew.adaptiveCells(objs, 100L, baseLevel = 8, maxLevel = 12)
    assert(out.count() === objs.count())
    assert(out.select("id").except(objs.select("id")).isEmpty)
  }

  test("saltedAgg(count,sum) equals plain groupBy count") {
    val salted = Skew.saltedAgg(objs, "cell", "id", salts = 8)(
      count(lit(1)), p => sum(p))
    val plain = objs.groupBy("cell").agg(count(lit(1)).as("agg"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedAgg(collect_list,flatten) equals plain collect_list as a multiset") {
    val salted = Skew.saltedAgg(objs, "cell", "id", salts = 4)(
        collect_list(col("id")), p => flatten(collect_list(p)))
      .select(col("cell"), explode(col("agg")).as("id"))
    val plain = objs.select("cell", "id")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = (0 to 6).map(i => (s"f$i", i * 2.0)).toDF("feature", "weight")
    val salted = Skew.saltedJoin(objs, dim, "feature", "id", salts = 8)
      .select("id", "feature", "weight")
    val plain = objs.join(dim, Seq("feature")).select("id", "feature", "weight")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("repartitionSaltedByCell: same-cell rows land in at most `salts` partitions") {
    val rep = Skew.repartitionSaltedByCell(objs, numPartitions = 16, salts = 4)
      .withColumn("pid", spark_partition_id())
    val spread = rep.groupBy("cell").agg(countDistinct("pid").as("nparts"))
    assert(spread.filter(col("nparts") > 4).isEmpty)
    assert(rep.count() === objs.count())
  }
}
