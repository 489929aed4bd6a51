package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.TableIO

/** Checkpoint/resume semantics: a completed stage is not recomputed, and the
 *  lineage manifest records per-partition metrics (north_rule resumability). */
class TableIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stage writes lineage manifest and skips recompute on resume") {
    val dir = Files.createTempDirectory("graft_stage").toString
    var computeRuns = 0
    def build() = {
      computeRuns += 1
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    }
    val first = TableIO.stage(spark, dir, "s1")(build())
    assert(first.count() == 100)
    assert(computeRuns == 1)
    assert(TableIO.isComplete(dir, "s1"))
    val manifest = Files.readString(TableIO.manifestPath(dir, "s1"))
    assert(manifest.contains("\"rows\": 100"))
    assert(manifest.contains("\"partitions\""))
    // resume: compute must NOT run again
    val second = TableIO.stage(spark, dir, "s1")(build())
    assert(second.count() == 100)
    assert(computeRuns == 1, "stage recomputed despite completed manifest")
  }

  test("partitioned stage lays out partition directories (pruning-ready)") {
    val dir = Files.createTempDirectory("graft_stage_p").toString
    val df = (1 to 50).map(i => (i.toLong, i % 4)).toDF("id", "bucket")
    TableIO.stage(spark, dir, "s2", partitionBy = Seq("bucket"))(df)
    val subdirs = new java.io.File(s"$dir/s2").listFiles().map(_.getName)
    assert(subdirs.count(_.startsWith("bucket=")) == 4)
  }
}
