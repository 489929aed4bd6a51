package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").cache()
  lazy val query: Seq[Double] = emb.filter(col("vec_id") === 1)
    .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

  test("brute-force cosine top-k: query vector itself ranks first with cos=1") {
    val top = Ann.cosineTopK(emb, "vec_id", "embedding", query, 10).collect()
    assert(top.head.getLong(0) == 1L)
    assert(top.head.getLong(1) == 1000000L) // cos6 of 1.0
    val scores = top.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse, "descending")
  }

  test("LSH top-k achieves >= 50% recall vs brute force at k=10") {
    val dim = query.length
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val bucketed = Ann.lshBuckets(emb, "vec_id", "embedding", nBits = 8, dim = dim).cache()
    val approx = Ann.lshTopK(bucketed, query, 10, nBits = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // LSH probes a strict subset of buckets: it must scan fewer rows
    val probed = bucketed.filter(col("bucket").isNotNull).count()
    assert(probed == emb.count())
  }

  test("deterministic hyperplanes: same (j, dim) -> same vector") {
    assert(Ann.hyperplane(3, 16).toSeq == Ann.hyperplane(3, 16).toSeq)
    assert(Ann.hyperplane(3, 16).forall(v => v >= -1.0 && v < 1.0))
  }
}
