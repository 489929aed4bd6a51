package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Packing

/**
 * Scale-up evidence for x12 (token-budget shard packing): replicate the
 * documents table R× and 2R× (fresh doc_ids), run the distributed
 * two-pass prefix sum, and report wall time plus the exactness invariants
 * (last offset + last toks == total tokens; shard count == ceil(total /
 * budget)). The point: the scan is two bounded shuffles + parallel
 * windows — doubling the corpus should roughly double the wall, and the
 * driver never holds more than one row per partition.
 *
 * Usage: runMain graft.tools.ScalePack [sfDir] [reps]
 */
object ScalePack {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 500
    val budget = 512L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // untimed warm-up: absorb the fresh session's one-time cost (codegen,
    // JIT, parquet footers) so the two timed legs compare cleanly
    Packing.tokenBudgetShards(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), length(col("text")).cast("long").as("toks")),
      "doc_id", "toks", budget).agg(max(col("shard"))).head()

    for (r <- Seq(reps, 2 * reps)) {
      val path = s"/tmp/graft-pack-scale-$r"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
        spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(r).toDF("rep"))
          .select((col("doc_id") * r + col("rep")).as("doc_id"),
            size(graft.sources.Derived.tokens(col("text"))).as("toks"))
          .repartition(64)
          .write.mode("overwrite").parquet(path)
      }
      val scaled = spark.read.parquet(path)
      val n = scaled.count()
      val total = scaled.agg(sum(col("toks"))).head().getLong(0)

      // min of 2 reps: the first rep at each size still carries residual
      // one-time costs (shuffle/file-stream init) that the warm-up above
      // does not fully absorb
      var lastEnd = 0L; var shards = 0L
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = Packing.tokenBudgetShards(scaled, "doc_id", "toks", budget)
        val last = out.orderBy(desc("doc_id")).limit(1).head()
        shards = out.agg(countDistinct(col("shard"))).head().getLong(0)
        lastEnd = last.getLong(2) + last.getLong(1)
        (System.nanoTime() - t0) / 1e9
      }
      val expectShards = (total + budget - 1) / budget
      println(f"PACKSCALE reps=$r rows=$n toks=$total wall=${walls.min}%.1f s " +
        f"(reps ${walls.map(w => f"$w%.1f").mkString("/")}) " +
        s"shards=$shards lastEnd=$lastEnd " +
        s"exact=${lastEnd == total && shards == expectShards}")
    }
    spark.stop()
  }
}
