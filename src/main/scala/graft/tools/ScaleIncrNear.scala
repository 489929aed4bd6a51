package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Incremental

/**
 * Data-bound telemetry for [[graft.ml.Incremental.ingestMinhash]] — the
 * complement of the fixed-cost d11 oracle cut: batches large enough that
 * the probe/refine work dominates the per-stage fixed costs.
 *
 * Corpus: each doc is 20 synthetic words drawn from a 5,000-token
 * vocabulary (random-looking per doc key, so banding collisions between
 * UNRELATED docs are rare); 10% of every batch k >= 1 re-uses a batch k-1
 * key with the last word changed — a ~0.9-Jaccard near-dup that must be
 * caught by the cross-batch probe+refine, and ~2% of each batch duplicates
 * an in-batch smaller key the same way. Expected acceptance: batch 0 ~98%,
 * later batches ~88%.
 */
object ScaleIncrNear {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-scale-incr-near").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsPerBatch = if (args.nonEmpty) args(0).toLong else 20000L
    val nBatches = if (args.length > 1) args(1).toInt else 3
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-scale-incrn-$rowsPerBatch"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    // words 0..19 of doc `key`: 8 hex chars of md5(key_i) — the operator
    // shingles at the CHARACTER level, so the word alphabet must be
    // trigram-diverse or every pair of docs looks like a near-dup (the
    // first cut of this tool used "tok<N>" words and collapsed the whole
    // corpus). Variant docs replace word 19 — shingle Jaccard ~0.9.
    def words(key: org.apache.spark.sql.Column, variant: Boolean) = {
      val parts = (0 until 20).map { i =>
        if (i == 19 && variant)
          substring(md5(concat(lit("v"), key.cast("string"))), 1, 8)
        else substring(md5(concat(key.cast("string"), lit(s"_$i"))), 1, 8)
      }
      concat_ws(" ", parts: _*)
    }
    def batch(k: Int) = {
      val fresh = spark.range(rowsPerBatch).select(
        (col("id") + k.toLong * 10000000L).as("doc_id"),
        // 2% in-batch near-dups: ids ending in 49 reuse the id-48 key
        words(when(col("id") % 50 === 49, col("id") - 1).otherwise(col("id")) +
          lit(k.toLong * rowsPerBatch), variant = false).as("text"))
      if (k == 0) fresh
      else {
        // overwrite the first 10% with variants of batch k-1 keys — from
        // its SECOND 10% (ids [n10, 2*n10)), which were fresh there: the
        // first 10% of batch k-1 were themselves variant rows, so their
        // keys never entered the corpus
        val n10 = rowsPerBatch / 10
        fresh.filter(col("doc_id") % 10000000L >= n10)
          .unionByName(spark.range(n10).select(
            (col("id") + k.toLong * 10000000L).as("doc_id"),
            words(col("id") + n10 + lit((k - 1).toLong * rowsPerBatch),
              variant = true).as("text")))
      }
    }

    for (k <- 0 until nBatches) {
      val t0 = System.nanoTime()
      val acc = Incremental.ingestMinhash(spark, dir, s"n$k", batch(k),
        "doc_id", "text", threshold = 0.5, maxBucket = Some(1000))
      val n = acc.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"INCRNEAR ingest=n$k rows=$rowsPerBatch accepted=$n " +
        f"state_stages=${k + 1} wall=$wall%.1f s")
    }
    spark.stop()
  }
}
