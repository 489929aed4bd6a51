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
}
