package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.{Incremental, Packing}
import graft.sources.Derived

/**
 * Phase-level wall breakdown of the x18 ingest loop (and a raw
 * tokenBudgetShards timing) — optimization-round diagnostics: which of the
 * per-ingest fixed costs (prior-stage rescan, monotonic-id check, pack
 * prefix scan, partitioned stage write) owns the wall at sf scale.
 *
 * Usage: runMain graft.tools.IncrProbe [sfDir]
 */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/graft-spark" else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm-up
    docs.count()
    val tbl = docs.select(col("doc_id"),
      size(Derived.tokens(col("text"))).cast("long").as("toks"))
    t("toks_count")(tbl.count())
    t("pack_raw")(Packing.tokenBudgetShards(tbl, "doc_id", "toks", 512L).count())
    t("pack_raw2")(Packing.tokenBudgetShards(tbl, "doc_id", "toks", 512L).count())

    val stateDir = "/dev/shm/graft-probe-incrp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    for ((nm, pred) <- Seq(
        ("b0", col("doc_id") < 170),
        ("b1", col("doc_id") >= 170 && col("doc_id") < 340),
        ("b2", col("doc_id") >= 340))) {
      t(s"ingest_$nm") {
        Incremental.ingestPack(spark, stateDir, nm, tbl.filter(pred),
          "doc_id", "toks", 512L).count()
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))

    // isolate the b2-sized stage-write cost: partitioned (≈470 shard dirs)
    // vs flat, and the read-back with partition discovery
    val b2 = tbl.filter(col("doc_id") >= 340)
    val packed = Packing.tokenBudgetShards(b2, "doc_id", "toks", 512L)
      .localCheckpoint(true)
    t("b2_pack_only")(packed.count())
    val out = "/dev/shm/graft-probe-write"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    t("b2_write_partitioned")(
      packed.write.mode("overwrite").partitionBy("shard").parquet(out))
    t("b2_readback_discover")(spark.read.parquet(out).count())
    t("b2_write_partitioned2")(
      packed.write.mode("overwrite").partitionBy("shard").parquet(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    t("b2_write_flat")(packed.write.mode("overwrite").parquet(out))
    t("b2_write_part_coalesce1")(
      packed.coalesce(1).write.mode("overwrite").partitionBy("shard").parquet(out))
    t("b2_write_part_repart")(
      packed.repartition(32, col("shard")).write.mode("overwrite")
        .partitionBy("shard").parquet(out))
    spark.conf.set("spark.sql.parquet.output.committer.class",
      "org.apache.parquet.hadoop.ParquetOutputCommitter")
    spark.conf.set("spark.sql.sources.outputCommitterClass",
      "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitter")
    spark.conf.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    t("b2_write_part_v2commit")(
      packed.write.mode("overwrite").partitionBy("shard").parquet(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    spark.stop()
  }
}
