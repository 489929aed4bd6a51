package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Curation, Dedup}

/**
 * Scale-up evidence for the curation chain (VERDICT r3 'Next round' #5):
 * run the full x9 composition over a 10×-replicated documents table
 * (deterministic near-dup replicas — each copy appends a version suffix,
 * so banding faces 10-deep near-dup clusters AND ~10× hotter buckets) and
 * report wall time plus the band-bucket telemetry that shows the
 * MaxBandBucket cap holding the pair join sub-quadratic:
 * admitted/skipped bucket counts, the pair count actually joined, and the
 * pair count the UNCAPPED banding would have formed.
 *
 * Usage: runMain graft.tools.ScaleX9 [sfDir] [reps]
 */
object ScaleX9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = s"/tmp/graft-x9-scale-$reps"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.crossJoin(spark.range(reps).toDF("rep"))
        .select(
          (col("doc_id") * reps + col("rep")).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v"), col("rep"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    }
    val scaled = spark.read.parquet(path)
    val n = scaled.count()
    println(s"X9SCALE input rows=$n (reps=$reps from $sfDir)")

    // the timed run: the exact x9 composition
    val t0 = System.nanoTime()
    val kept = Curation.plan(scaled).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"X9SCALE wall=$wall%.1f s kept=$kept")

    // telemetry (untimed): bucket-size distribution + pair counts
    val filtered = Curation.filterStage(Curation.redactStage(scaled))
      .localCheckpoint(eager = true)
    val sigs = Dedup.minhashSignatures(filtered, "doc_id", "redacted")
      .localCheckpoint(eager = true)
    import Dedup.MinHash._
    val nBands = NumHashes / BandSize
    val bands = (0 until nBands).map { b =>
      val key = concat_ws(",",
        (0 until BandSize).map(j => col(s"h${b * BandSize + j}").cast("string")): _*)
      sigs.select(col("doc_id"), lit(b).as("band"), key.as("band_key"))
    }.reduce(_ unionByName _)
    val sizes = bands.groupBy("band", "band_key").agg(count(lit(1)).as("bn"))
      .localCheckpoint(eager = true)
    val cap = Curation.MaxBandBucket
    val stats = sizes.agg(
      count(lit(1)).as("buckets"),
      sum(when(col("bn") <= cap, 1L).otherwise(0L)).as("admitted"),
      sum(when(col("bn") > cap, 1L).otherwise(0L)).as("skipped"),
      max(col("bn")).as("max_bucket"),
      sum((col("bn") * (col("bn") - 1) / 2).cast("long")).as("uncapped_pairs"),
      sum(when(col("bn") <= cap, (col("bn") * (col("bn") - 1) / 2).cast("long"))
        .otherwise(0L)).as("capped_pairs")).head()
    println(s"X9SCALE buckets=${stats.getLong(0)} admitted=${stats.getLong(1)} " +
      s"skipped=${stats.getLong(2)} maxBucket=${stats.getLong(3)} " +
      s"uncappedPairs=${stats.getLong(4)} cappedPairs=${stats.getLong(5)}")
    val candPairs = Dedup.minhashCandidates(sigs, Some(cap)).count()
    println(s"X9SCALE distinctCandidatePairs=$candPairs")
    spark.stop()
  }
}
