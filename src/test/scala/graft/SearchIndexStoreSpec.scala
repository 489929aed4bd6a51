package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.query.{SearchIndex, SearchIndexStore}
import graft.sources.Derived

/**
 * The index's at-rest lifecycle (the reference's build-once/serve-later
 * split): write persists bucketed postings/lengths/docs, load re-registers
 * and serves identical scores without rebuilding, writes are idempotent,
 * term lookups push down, and a missing store fails loudly.
 */
class SearchIndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
  private val terms = Seq("spark", "join", "src3")

  private def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("doc_id"), Derived.q6(col("score")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("write once, load serves identical BM25F/BM25+/search results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val fresh = new SearchIndex(docs, "doc_id", "text", "source")
    SearchIndexStore.write(spark, docs, "doc_id", "text", "source", dir)
    val loaded = SearchIndexStore.load(spark, dir)

    assert(scores(loaded.bm25f(terms)) == scores(fresh.bm25f(terms)))
    assert(scores(loaded.bm25plus(terms)) == scores(fresh.bm25plus(terms)))
    val f = fresh.search("Spark, JOIN src3!", 10)
      .select(col("doc_id"), Derived.q6(col("score")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = loaded.search("Spark, JOIN src3!", 10)
      .select(col("doc_id"), Derived.q6(col("score")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(l == f && f.nonEmpty)

    // idempotent: a second write skips every completed stage
    SearchIndexStore.write(spark, docs, "doc_id", "text", "source", dir)
    assert(scores(SearchIndexStore.load(spark, dir).bm25f(terms)) ==
      scores(fresh.bm25f(terms)))

    // query-term lookups push down to the at-rest postings scan
    val plan = loaded.postingsName
      .filter(col("term").isin(terms: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"expected a term IN pushdown in:\n$plan")
  }

  test("loading a missing store fails loudly") {
    val empty = java.nio.file.Files.createTempDirectory("graft-idx-missing").toString
    val e = intercept[RuntimeException] { SearchIndexStore.load(spark, empty) }
    assert(e.getMessage.contains("run SearchIndexStore.write first"))
  }
}
