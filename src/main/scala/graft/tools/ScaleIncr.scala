package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Incremental

/**
 * Ingest-cost telemetry for [[graft.ml.Incremental]]: per-batch ingest wall
 * as the persisted state log grows, and the effect of [[Incremental.compact]].
 *
 * Each ingest anti-joins the new batch against every prior stage, so the
 * per-ingest cost grows with TOTAL accepted state scanned (linear —
 * unavoidable for exact dedup without probabilistic pre-filters), plus a
 * per-stage fixed cost (one join / one file listing each) that compaction
 * exists to reclaim. The run prints per-ingest walls for a growing log,
 * compacts, then ingests one more batch over the single folded stage —
 * the post-compact wall should drop back toward the early-log ones.
 *
 * Batches are deterministic: batch k holds `rowsPerBatch` texts of which
 * 20% duplicate texts from batch k-1 (cross-batch rejects) and 10%
 * duplicate in-batch.
 */
object ScaleIncr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-scale-incr").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsPerBatch = if (args.nonEmpty) args(0).toLong else 2000000L
    val nBatches = if (args.length > 1) args(1).toInt else 6
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-scale-incr-$rowsPerBatch"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    // text identity is the long `key`: batch k spans keys
    // [k*0.8*R, k*0.8*R + R) so 20% of each batch overlaps the previous;
    // within the batch, keys repeat every 10th row (in-batch dups)
    def batch(k: Int) = {
      val base = (k * (rowsPerBatch * 8 / 10))
      spark.range(rowsPerBatch).select(
        (col("id") + lit(k.toLong * 100000000L)).as("doc_id"),
        concat(lit("synthetic document text for key "),
          (lit(base) + when(col("id") % 10 === 9, col("id") - 9)
            .otherwise(col("id"))).cast("string")).as("text"))
    }

    var totalAccepted = 0L
    for (k <- 0 until nBatches) {
      val t0 = System.nanoTime()
      val acc = Incremental.ingestExact(spark, dir, s"b$k", batch(k), "doc_id", "text")
      val n = acc.count()
      totalAccepted += n
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"INCR ingest=b$k rows=$rowsPerBatch accepted=$n state_stages=${k + 1} wall=$wall%.1f s")
    }
    val tc = System.nanoTime()
    Incremental.compact(spark, dir)
    println(f"INCR compact total_state=$totalAccepted wall=${(System.nanoTime() - tc) / 1e9}%.1f s")
    val tl = System.nanoTime()
    val last = Incremental.ingestExact(spark, dir, s"b$nBatches", batch(nBatches),
      "doc_id", "text").count()
    println(f"INCR ingest=b$nBatches(post-compact) accepted=$last state_stages=2 wall=${(System.nanoTime() - tl) / 1e9}%.1f s")
    spark.stop()
  }
}
