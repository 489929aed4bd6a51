package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming exact deduplication — the live half of the training-data dedup
 * pipeline ([[graft.ml.Dedup]]): a stream of (ts, doc_id, text) rows is
 * reduced to one representative row per distinct text, with state bounded
 * by the event-time watermark (a duplicate arriving later than the
 * watermark delay can be re-admitted; within the horizon dedup is exact).
 *
 * This is also the one place the reference's ARRIVAL-ORDER dedup semantics
 * (`isNodeDuplicateCheck` against a growing map,
 * /root/reference/pkg/index/indexer.go:582-618) are genuinely expressible:
 * the batch re-expression had to replace "first arrival wins" with the
 * deterministic min-id keep rule ([[graft.ml.Dedup.exact]], SURVEY P4);
 * a stream HAS an arrival order, so first-seen-wins is the natural
 * streaming-state rule (`dropDuplicatesWithinWatermark`).
 *
 * Scale shape: state is one entry per distinct key within the watermark
 * horizon, hash-partitioned across executors by key — the same shuffle key
 * as the batch groupBy, continuously maintained.
 */
object DedupStream {

  /** One representative row per distinct `text`. `docs` must carry
   *  (ts, doc_id, text); the emitted row is the first-seen one per key.
   *  State is keyed on the FULL text, not a hash: a 64-bit hash key would
   *  silently drop a distinct document on collision (statistically certain
   *  at 10^12 rows), and the state store hashes its key anyway — exactness
   *  costs only the stored key bytes, the same price the batch
   *  groupBy(text) pays. */
  def dedup(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text")

  /**
   * Streaming benchmark decontamination — the live half of
   * [[graft.ml.Dedup.decontaminate]], the crawl shape: documents stream in,
   * the eval-suite span set is STATIC, and every (doc_id, span) benchmark
   * overlap is emitted as a contamination event. Fully STATELESS: the
   * per-row span explode is map-side (array_distinct inside the row stands
   * in for the batch countDistinct — no cross-microbatch state), and the
   * stream-static inner join broadcasts the bench spans exactly as the
   * batch operator does. Per-doc hit counts / drop decisions are a
   * downstream batch aggregation over the event log, so the stream never
   * holds doc state.
   *
   * `stream` carries (doc_id, text); `bench` is a static (doc_id, text)
   * table. Output: (doc_id, span), one row per distinct overlapping span.
   */
  def decontaminateStream(stream: DataFrame, bench: DataFrame, k: Int): DataFrame = {
    val benchSp = graft.ml.Dedup.spanTable(bench, "doc_id", "text", k)
      .select(col("span")).distinct()
    stream
      .select(col("doc_id"), explode(array_distinct(
        graft.ml.Dedup.spans(graft.sources.Derived.tokens(col("text")), k))).as("span"))
      .join(broadcast(benchSp), Seq("span"))
      .select(col("doc_id"), col("span"))
  }

  /** Drive a batch doc table through [[decontaminateStream]] synchronously
   *  (memory sink, AvailableNow) — test/parity harness. */
  def runDecontamBatchAsStream(spark: SparkSession, docs: DataFrame,
                               bench: DataFrame, k: Int,
                               queryName: String = "decontam_stream"): DataFrame = {
    val dirPath = java.nio.file.Files.createTempDirectory("decontam_stream_src")
    val dir = dirPath.toString
    try {
      docs.select("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .parquet(dir)
      val q = decontaminateStream(stream, bench, k)
        .writeStream.outputMode("append")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sink = spark.table(queryName)
      val rows = sink.collect().toSeq
      val out = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 4096 + 1)),
        sink.schema)
      spark.catalog.dropTempView(queryName)
      out
    } finally {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(dirPath))
        java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Drive a batch table through the streaming dedup synchronously (memory
   *  sink, AvailableNow) — test/parity harness, same pattern as
   *  [[TileStream.runBatchAsStream]]. */
  def runBatchAsStream(spark: SparkSession, docs: DataFrame,
                       watermarkDelay: String = "10 minutes",
                       queryName: String = "dedup_stream"): DataFrame = {
    val dirPath = java.nio.file.Files.createTempDirectory("dedup_stream_src")
    val dir = dirPath.toString
    try {
      docs.select("ts", "doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .parquet(dir)
      val q = dedup(stream, watermarkDelay)
        .writeStream.outputMode("append")
        .format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // return a COPY detached from the memory sink, so the sink's temp view
      // can be dropped here instead of accumulating one per invocation
      val sink = spark.table(queryName)
      val rows = sink.collect().toSeq
      val out = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 4096 + 1)),
        sink.schema)
      spark.catalog.dropTempView(queryName)
      out
    } finally {
      // the temp source dir would otherwise leak disk on every call
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(dirPath))
        java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
