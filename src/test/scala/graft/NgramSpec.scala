package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.NGramLM

/**
 * N-gram LM counts + stupid backoff vs the reference fixtures
 * (/root/reference/pkg/searcher/ngram_lm_test.go:46-201, :365-489).
 * Fixture docs (termID form): [[3,4,5],[6,5,5,5,5],[11,12,6,6,6]];
 * <s>=0, </s>=1.
 */
class NgramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val data: Seq[Seq[Long]] = Seq(Seq(3L, 4L, 5L), Seq(6L, 5L, 5L, 5L, 5L), Seq(11L, 12L, 6L, 6L, 6L))
  lazy val counts = NGramLM.countTables(data.map(Tuple1(_)).toDF("terms"))
  lazy val model = NGramLM.collectModel(counts)

  test("unigram counts + TotalWordFreq match ngram_lm_test.go:63-76") {
    val expected = Map(0L -> 3L, 1L -> 3L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      6L -> 4L, 11L -> 1L, 12L -> 1L)
    assert(model.uni == expected)
    assert(model.totalWordFreq == 19L)
  }

  test("bigram counts include <s><s> and <s>w1 padding (ngram_lm_test.go:97-113)") {
    // each doc contributes (<s>,<s>) once with n=2 padding
    assert(model.bi(Seq(0L, 0L)) == 3L)
    assert(model.bi(Seq(0L, 3L)) == 1L) // <s> -> 3 (doc 1 head)
    assert(model.bi(Seq(5L, 5L)) == 3L) // 5 5 5 5 run
    assert(model.bi(Seq(5L, 1L)) == 2L) // docs 1,2 end in 5 </s>
    assert(model.bi(Seq(6L, 6L)) == 2L)
  }

  test("estimateProbability: P(5 | 6) = bi(6,5)/uni(6)") {
    assert(model.estimate(5L, Seq(6L), 2) == 1.0 / 4.0)
    assert(model.estimate(5L, Seq.empty, 1) == 5.0 / 19.0)
    // unseen prefix -> 0 (ngram_lm.go:246-252)
    assert(model.estimate(5L, Seq(99L), 2) == 0.0)
  }

  test("stupid backoff: lambda 0.4 per level (ngram_lm.go:323-342)") {
    // quad (99,98,97)->5 unseen everywhere until unigram: 0.4^3 * P1(5)
    val p = model.stupidBackoff(5L, Seq(99L, 98L, 97L), 4)
    assert(math.abs(p - 0.4 * 0.4 * 0.4 * (5.0 / 19.0)) < 1e-12)
    // seen quadgram backs off zero levels: doc2 [<s>x4? no — query path pads
    // with 4 <s>; quad (0,0,0)? use tri present in training of n=4 table:
    val pSeen = model.stupidBackoff(5L, Seq(0L, 0L, 0L), 4)
    assert(pSeen > 0)
  }

  test("query log-prob pads 4x<s> + </s> and sums logs (ngram_lm.go:303-321)") {
    val q = Seq(3L, 4L, 5L)
    val padded = Seq(0L, 0L, 0L, 0L) ++ q :+ 1L
    val expected = (4 until padded.length).map { i =>
      math.log(model.stupidBackoff(padded(i), padded.slice(i - 3, i), 4))
    }.sum
    assert(math.abs(model.queryLogProb(q) - expected) < 1e-12)
    assert(model.queryLogProb(q) < 0)
  }

  test("distributed join scoring == collected-model scoring, every backoff level") {
    // candidates chosen to exercise every stupid-backoff level: full quad
    // hits, tri/bi/uni fallbacks, unseen ids (log 0 = -Inf), empty query
    val candidates = Seq(
      Seq(3L, 4L, 5L),           // exact corpus doc
      Seq(6L, 5L, 5L),           // prefix of corpus doc
      Seq(5L, 6L),               // cross-doc bigram fallback
      Seq(6L, 6L, 6L, 5L),       // tail overlap
      Seq(99L),                  // unseen id -> unigram floor 0 -> -Inf
      Seq(2L),                   // <UNK> never counted here -> -Inf
      Seq.empty[Long]            // just the </s> transition
    ).zipWithIndex.map(_.swap)
    val dist = NGramLM.queryLogProbsDistributed(counts, candidates)
    candidates.foreach { case (cid, q) =>
      val exp = model.queryLogProb(q)
      val got = dist(cid)
      if (exp.isNegInfinity) assert(got.isNegInfinity, s"cid=$cid: $got vs -Inf")
      else assert(math.abs(got - exp) < 1e-12, s"cid=$cid: $got vs $exp")
    }
  }

  test("OOV replacement: corpus freq < 2 becomes <UNK> (ngram_lm.go:69-110)") {
    val replaced = NGramLM.replaceOOV(data.map(Tuple1(_)).toDF("terms"))
      .collect().map(_.getSeq[Long](0)).toSet
    // 3,4,11,12 are singletons -> UNK(2); 5 and 6 survive
    assert(replaced.contains(Seq(2L, 2L, 5L)))
    assert(replaced.contains(Seq(6L, 5L, 5L, 5L, 5L)))
    assert(replaced.contains(Seq(2L, 2L, 6L, 6L, 6L)))
  }
}
