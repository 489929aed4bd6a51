package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/**
 * Streaming exact dedup: one representative per distinct text, matching the
 * batch distinct-key set; duplicates inside the watermark horizon are
 * suppressed regardless of which microbatch they arrive in.
 */
class DedupStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stream emits exactly one representative per distinct text") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val docs = Seq(
      (ts(0), 1L, "alpha beta"),
      (ts(1), 2L, "alpha beta"),   // dup of 1 within horizon
      (ts(2), 3L, "gamma delta"),
      (ts(3), 4L, "epsilon"),
      (ts(4), 5L, "gamma delta"),  // dup of 3
      (ts(5), 6L, "alpha beta")    // dup of 1, later microbatch position
    ).toDF("ts", "doc_id", "text")

    val out = DedupStream.runBatchAsStream(spark, docs,
      watermarkDelay = "30 minutes", queryName = "dedup_stream_spec")

    // one row per distinct text, and the key set equals the batch distinct set
    val streamTexts = out.select("text").as[String].collect().sorted
    val batchTexts = docs.select("text").distinct().as[String].collect().sorted
    assert(streamTexts.toSeq == batchTexts.toSeq)
    assert(out.count() == 3)
    // representatives are real input rows (doc_id drawn from the dup group)
    val reps = out.select("text", "doc_id").as[(String, Long)].collect().toMap
    assert(Set(1L, 2L, 6L).contains(reps("alpha beta")))
    assert(Set(3L, 5L).contains(reps("gamma delta")))
    assert(reps("epsilon") == 4L)
  }

  test("streaming decontamination: events match batch n_hits and the plan is stateless") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "entirely novel training text here"),
      (3L, "lazy dog sleeps all day"),
      (4L, "lazy dog sleeps lazy dog sleeps") // within-doc repeat: ONE event
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high"),
      (101L, "a lazy dog sleeps")
    ).toDF("doc_id", "text")

    val events = DedupStream.runDecontamBatchAsStream(spark, train, bench, k = 3,
      queryName = "decontam_stream_spec")
    // event set is per-(doc, span) distinct even for within-doc repeats
    assert(events.count() == events.distinct().count())
    // per-doc event counts equal the batch operator's n_hits
    val streamHits = events.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val batchHits = graft.ml.Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(batchHits.filter(_._2 > 0) == streamHits)
    // stateless: no aggregation / dedup state operator in the stream plan
    val empty = java.nio.file.Files.createTempDirectory("decontam_plan").toString
    val plan = DedupStream.decontaminateStream(
        spark.readStream.schema(train.schema).parquet(empty), bench, 3)
      .queryExecution.logical.toString
    assert(!plan.contains("DeduplicateWithinWatermark"))
    assert(!plan.contains("EventTimeWatermark"))
    assert(!plan.contains("Aggregate"))
    // exactly ONE Deduplicate — the bench-side distinct on the STATIC
    // subtree; the streaming subtree is pure project/explode/join
    assert(plan.sliding("Deduplicate".length).count(_ == "Deduplicate") == 1)
  }
}
