package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.{Ann, Dedup}

/**
 * Degenerate-corpus telemetry for the round-5 `maxBucket` caps on
 * [[graft.ml.Dedup.simhashPairs]] and [[graft.ml.Ann.cosinePairs]] — the
 * low-entropy worst case BENCH.md's ScaleThumb run measured for perceptual
 * bands, now measured for the simhash 16-bit bands and the LSH cosine
 * buckets: N identical documents / vectors collapse into ONE signature, so
 * every band bucket holds N members and the uncapped join forms
 * O(N²) pairs carrying zero similarity signal. The would-be pair count is
 * derived from bucket sizes (sum B·(B−1)/2 per bucket — never formed);
 * the capped join actually runs and is timed.
 */
object ScaleBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-scale-buckets").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 50000L
    // all-identical text + a handful of genuinely-similar sparse pairs
    val docs = spark.range(n).select(col("id").as("doc_id"),
        lit("the same boilerplate licence header text repeated verbatim").as("text"))
      .unionByName(Seq(
        (n + 1, "a unique pair of nearly identical sentences here"),
        (n + 2, "a unique pair of nearly identical sentences here")).toDF("doc_id", "text"))
      .localCheckpoint(true)

    val sigs = Dedup.simhash(docs, "doc_id", "text").localCheckpoint(true)
    val bands = (0 until 4).map(b =>
      sigs.select(shiftrightunsigned(col("simhash"), b * 16)
        .bitwiseAND(lit(0xffffL)).as("band_key"), lit(b).as("band")))
      .reduce(_ unionByName _)
    val wouldBe = bands.groupBy("band", "band_key").agg(count(lit(1)).as("bn"))
      .agg(sum(expr("bn * (bn - 1) div 2"))).head().getLong(0)
    val t0 = System.nanoTime()
    val capped = Dedup.simhashPairs(sigs, maxHamming = 3, maxBucket = Some(1000)).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"BUCKETCAP simhash n=${n + 2} uncappedPairs=$wouldBe cappedPairs=$capped wall=$wall%.1f s")

    // embedding twin: identical vectors -> one LSH bucket
    val dim = 8
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        typedLit(Seq.fill(dim)(0.5f)).as("embedding"))
      .unionByName(Seq(
        (n + 1, Seq(-0.9f, 0.05f, 0.8f, -0.6f, 0.1f, -0.2f, 0.3f, -0.4f)),
        (n + 2, Seq(-0.89f, 0.06f, 0.81f, -0.61f, 0.1f, -0.2f, 0.3f, -0.4f)))
        .toDF("vec_id", "embedding"))
      .localCheckpoint(true)
    val bucketed = Ann.lshBuckets(vecs, "vec_id", "embedding", nBits = 12, dim = dim)
      .localCheckpoint(true)
    val wouldBeC = bucketed.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .agg(sum(expr("bn * (bn - 1) div 2"))).head().getLong(0)
    val t1 = System.nanoTime()
    val cappedC = Ann.cosinePairs(bucketed, 0.95, maxBucket = Some(1000)).count()
    val wallC = (System.nanoTime() - t1) / 1e9
    println(f"BUCKETCAP cosine n=${n + 2} uncappedPairs=$wouldBeC cappedPairs=$cappedC wall=$wallC%.1f s")
    spark.stop()
  }
}
