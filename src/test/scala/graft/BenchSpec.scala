package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Cells

/**
 * Driver-contract guard for the benchmark main: the scaled input derivation
 * and the composite north job must keep working (the driver runs
 * `graft.Bench` unattended every round, so a regression here silently
 * voids the round's perf artifact).
 */
class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scaledObjects: exact replica count, derived schema, no cell column") {
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    val n = orders.count()
    val target = 4 * n + 17 // deliberately not a multiple
    val df = Bench.scaledObjects(spark, TestSpark.Sf, target)
    assert(df.columns.toSeq == Seq("id", "lat", "lon", "feature"))
    assert(df.count() == 4 * n) // floor(target / n) replicas per key
    // ids are unique (key*r+rep is a bijection over (key, rep))
    assert(df.select("id").distinct().count() == 4 * n)
    // positions land in the derived region
    val r = df.agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(r.getDouble(0) >= -8.5 && r.getDouble(1) <= -5.5)
    assert(r.getDouble(2) >= 106.0 && r.getDouble(3) <= 111.0)
  }

  test("northJob runs the three phases end-to-end and returns the input row count") {
    val dir = java.nio.file.Files.createTempDirectory("bench-north").toString + "/input"
    val rows = Bench.scaledObjects(spark, TestSpark.Sf, 60000)
    rows.repartition(4).write.mode("overwrite").parquet(dir)
    val total = Bench.northJob(spark, dir)
    assert(total == rows.count())
  }

  test("cell childRange covers exactly the descendant ids (Morton-contiguous)") {
    val c = Cells.encode(-7.25, 108.5, 9)
    val (lo, hi) = Cells.childRange(c, 11)
    // all 16 level-11 descendants fall inside, and count matches the range
    val desc = Cells.children(c).flatMap(Cells.children)
    assert(desc.length == 16)
    desc.foreach(d => assert(d >= lo && d <= hi))
    // a neighbor's descendants fall outside
    val nb = Cells.ring(c, 1).head
    Cells.children(nb).flatMap(Cells.children)
      .foreach(d => assert(d < lo || d > hi))
  }
}
