package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Dedup

/**
 * Scale-up evidence for the exact substring-span family (d8/d8b/d9): run
 * spanDupStats and spanRemove over an R×- and 2R×-replicated documents
 * table (EXACT copies under fresh doc_ids — the worst case: every span is
 * duplicated R-fold, so the dup-occurrence join fan-in per span key is
 * maximal) and report wall times plus span telemetry. The point to
 * demonstrate: unlike pair-forming operators (minhash banding), the span
 * operators join OCCURRENCES to the dup-span set — cost is linear in
 * corpus size even when everything is duplicated, so doubling the
 * replication should roughly double the wall time, never square it.
 *
 * Usage: runMain graft.tools.ScaleSpan [sfDir] [reps]
 */
object ScaleSpan {
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

    for (r <- Seq(reps, 2 * reps)) {
      val path = s"/tmp/graft-span-scale-$r"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
        spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(spark.range(r).toDF("rep"))
          .select((col("doc_id") * r + col("rep")).as("doc_id"), col("text"))
          .repartition(64)
          .write.mode("overwrite").parquet(path)
      }
      val scaled = spark.read.parquet(path)
      val n = scaled.count()

      // force FULL evaluation with value aggregates — a bare count() lets
      // Catalyst eliminate the key-unique outer joins and skip the work
      val t0 = System.nanoTime()
      val stat = Dedup.spanDupStats(scaled, "doc_id", "text", 5)
        .agg(sum(col("dup_cov")).as("cov"), sum(col("dup_spans")).as("ds")).head()
      val statWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cut = Dedup.spanRemove(scaled, "doc_id", "text", 5)
        .agg(sum(col("n_cut")).as("cut"), sum(length(col("text_dedup"))).as("len")).head()
      val cutWall = (System.nanoTime() - t1) / 1e9
      println(f"SPANSCALE reps=$r rows=$n spanDupStats=$statWall%.1f s " +
        f"(cov=${stat.getLong(0)} dupSpans=${stat.getLong(1)}) " +
        f"spanRemove=$cutWall%.1f s (cut=${cut.getLong(0)} keptChars=${cut.getLong(1)})")

      // telemetry (untimed): corpus span volume and the hottest span key
      val sp = Dedup.spanTable(scaled, "doc_id", "text", 5)
      val agg = sp.groupBy("span").agg(count(lit(1)).as("n"))
      val t = agg.agg(sum(col("n")).as("occ"),
        sum(when(col("n") >= 2, col("n")).otherwise(0L)).as("dup_occ"),
        max(col("n")).as("hottest")).head()
      println(s"SPANSCALE reps=$r spanOcc=${t.getLong(0)} " +
        s"dupOcc=${t.getLong(1)} hottestSpan=${t.getLong(2)}")
    }

    // ---- the hot-span worst case: ONE span at >= 10^6 occurrences --------
    // A mega-hot boilerplate k-gram (license header) is the skew the old
    // Window.partitionBy(span) form serialized into one task. Synthetic
    // corpus: H tiny docs, each contributing exactly one occurrence of the
    // same 5-gram plus one unique tail span. Linearity check: H and 2H.
    import spark.implicits._
    for (h <- Seq(500000L, 1000000L)) {
      val hotDocs = spark.range(h).select(
        (col("id") + 1000000000L).as("doc_id"),
        concat(lit("lorem ipsum dolor sit amet tail"),
          col("id").cast("string")).as("text"))
        .repartition(64).localCheckpoint(true)
      val t0 = System.nanoTime()
      val stat = Dedup.spanDupStats(hotDocs, "doc_id", "text", 5)
        .agg(sum(col("dup_cov")).as("cov"), sum(col("dup_spans")).as("ds")).head()
      val statWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cut = Dedup.spanRemove(hotDocs, "doc_id", "text", 5)
        .agg(sum(col("n_cut")).as("cut"), sum(length(col("text_dedup"))).as("len")).head()
      val cutWall = (System.nanoTime() - t1) / 1e9
      // every doc's pos-0 span is THE hot span (h occurrences, all dup);
      // the pos-1 span (".. amet tailN") is unique -> dup_spans per doc = 1,
      // coverage = 5 tokens; spanRemove keeps only the first doc's copy.
      assert(stat.getLong(1) == h, s"expected $h dup spans, got ${stat.getLong(1)}")
      assert(stat.getLong(0) == 5L * h, s"expected cov ${5 * h}, got ${stat.getLong(0)}")
      assert(cut.getLong(0) == 5L * (h - 1), s"expected cut ${5 * (h - 1)}")
      println(f"SPANHOT docs=$h hotOcc=$h spanDupStats=$statWall%.1f s " +
        f"spanRemove=$cutWall%.1f s (cov=${stat.getLong(0)} cut=${cut.getLong(0)})")
    }
    spark.stop()
  }
}
