package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * 1–4-gram language model with stupid backoff, used to rank corrected-query
 * candidates.
 *
 * Count semantics are faithful to the reference
 * (/root/reference/pkg/searcher/ngram_lm.go):
 *  - each doc is padded with n x <s> and one </s> before counting n-grams
 *    (addStartEndToken, ngram_lm.go:373-384) — note n start tokens, one end
 *  - OOV: words with corpus freq < 2 become <UNK>
 *    (COUNT_THRESOLD_NGRAM=2, ngram_lm.go:69-110)
 *  - stupid backoff with lambda 0.4 per level (ngram_lm.go:323-342);
 *    estimateProbability returns 0 when the (n-1)-gram prefix is unseen
 *    (ngram_lm.go:213-321)
 *  - query log-prob: pad with 4 x <s> + </s>, sum log(backoff-4gram) from
 *    i=4 (ngram_lm.go:303-321)
 *
 * Distributed build: counts are `explode(sliding window) -> groupBy.count`
 * jobs; the count tables are small relative to the corpus (vocabulary
 * scale) and are collected/broadcast for query-time scoring, exactly like
 * the reference loads them into RAM (searcher.go:37-73).
 *
 * Special token IDs are fixed (deterministic, vs the reference's first-seen
 * order): <s>=0, </s>=1, <UNK>=2; real terms from TextIndex.termIds start
 * at 3.
 */
object NGramLM {
  val StartId = 0L
  val EndId = 1L
  val UnkId = 2L
  val CountThreshold = 2

  /** Build the n-gram count DataFrames from docs of term-ID arrays.
   *  Input df: single column `terms: array<long>`. Returns a DataFrame
   *  (n, gram array<long>, cnt) for n = 1..4, plus total word freq. */
  def countTables(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    (1 to 4).map { n =>
      val padded = concat(
        array_repeat(lit(StartId), n), col("terms"), array(lit(EndId)))
      docs.select(padded.as("p"))
        .select(explode(expr(s"transform(sequence(0, size(p) - $n), i -> slice(p, i + 1, $n))"))
          .as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .withColumn("n", lit(n))
    }.reduce(_ unionByName _)
  }

  /** Replace rare words with <UNK> (ngram_lm.go:69-110): corpus freq < 2. */
  def replaceOOV(docs: DataFrame): DataFrame = {
    val freqs = docs.select(explode(col("terms")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .filter(col("c") >= CountThreshold)
      .agg(collect_set(col("t")).as("keep"))
    docs.crossJoin(broadcast(freqs))
      .select(expr(s"transform(terms, t -> CASE WHEN array_contains(keep, t) THEN t ELSE ${UnkId}L END)").as("terms"))
  }

  /** Collected, broadcastable model for driver-side candidate ranking. */
  case class Model(uni: Map[Long, Long], bi: Map[Seq[Long], Long],
                   tri: Map[Seq[Long], Long], quad: Map[Seq[Long], Long],
                   totalWordFreq: Long) {

    /** estimateProbability (ngram_lm.go:213-321). */
    def estimate(next: Long, prev: Seq[Long], n: Int): Double = n match {
      case 1 => uni.getOrElse(next, 0L).toDouble / totalWordFreq
      case 2 =>
        uni.get(prev(0)) match {
          case None => 0.0
          case Some(d) => bi.getOrElse(Seq(prev(0), next), 0L).toDouble / d
        }
      case 3 =>
        bi.get(prev.take(2)) match {
          case None => 0.0
          case Some(d) => tri.getOrElse(prev.take(2) :+ next, 0L).toDouble / d
        }
      case 4 =>
        tri.get(prev.take(3)) match {
          case None => 0.0
          case Some(d) => quad.getOrElse(prev.take(3) :+ next, 0L).toDouble / d
        }
      case _ => 0.0
    }

    /** stupidBackoff (ngram_lm.go:323-342), lambda *= 0.4 per level. */
    def stupidBackoff(next: Long, prevIn: Seq[Long], nIn: Int): Double = {
      var prob = 0.0
      var lambda = 1.0
      var prev = prevIn
      var n = nIn
      while (n > 0) {
        prob = lambda * estimate(next, prev, n)
        if (prob != 0) return prob
        if (prev.length == 1) prev = Seq.empty
        else if (prev.nonEmpty) prev = prev.tail
        lambda *= 0.4
        n -= 1
      }
      prob
    }

    /** Query log-prob (ngram_lm.go:303-321 + GetQueryNgramProbability):
     *  pad 4 x <s> + </s>, sum log over positions 4..end. */
    def queryLogProb(query: Seq[Long]): Double = {
      val padded = Seq.fill(4)(StartId) ++ query :+ EndId
      (4 until padded.length).map { i =>
        math.log(stupidBackoff(padded(i), padded.slice(i - 3, i), 4))
      }.sum
    }
  }

  /** Collect the count tables into a driver/broadcast Model. */
  def collectModel(counts: DataFrame): Model = {
    val rows = counts.collect()
    def grams(n: Int): Map[Seq[Long], Long] = rows.filter(_.getAs[Int]("n") == n)
      .map(r => (r.getAs[Seq[Long]]("gram"), r.getAs[Long]("cnt"))).toMap
    val uni = rows.filter(_.getAs[Int]("n") == 1)
      .map(r => (r.getAs[Seq[Long]]("gram").head, r.getAs[Long]("cnt"))).toMap
    val total = uni.values.sum
    Model(uni, grams(2), grams(3), grams(4), total)
  }
}
