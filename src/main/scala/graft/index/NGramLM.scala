package graft.index

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /**
   * Distributed twin of [[Model.queryLogProb]]: score a SMALL set of
   * candidate queries against the (possibly huge) count tables by JOINING
   * their padded 4-gram positions against the counts — the model never
   * leaves the cluster, unlike [[collectModel]]. The stupid-backoff CASE
   * per position mirrors [[Model.stupidBackoff]] exactly: a level fires
   * iff its prefix AND its n-gram are both present (count tables only hold
   * positive counts, so presence == nonzero estimate); λ = 0.4 per skipped
   * level; the unigram floor uses log(-Inf-safe) handling identical to
   * `math.log(0)`.
   *
   * `candidates`: (cid, term-id sequence). Returns cid -> LM log-prob.
   * Collected output is candidate-scale (= the reference's per-request
   * candidate list), NOT model-scale.
   */
  def queryLogProbsDistributed(counts: DataFrame,
                               candidates: Seq[(Int, Seq[Long])]): Map[Int, Double] = {
    if (candidates.isEmpty) return Map.empty
    val spark = counts.sparkSession
    import spark.implicits._
    val total = Option(counts.filter(col("n") === 1).agg(sum("cnt")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val positions = candidates.flatMap { case (cid, q) =>
      val padded = Seq.fill(4)(StartId) ++ q :+ EndId
      (4 until padded.length).map { i =>
        (cid, i, padded(i - 3), padded(i - 2), padded(i - 1), padded(i))
      }
    }
    val pos = positions.toDF("cid", "pos", "p1", "p2", "p3", "nxt")
    // one lookup table per n, joined on the gram array (tiny probe side —
    // Spark broadcasts the POSITIONS, streaming the big counts side)
    def cnts(n: Int) = counts.filter(col("n") === n).select(col("gram"), col("cnt"))
    def lj(df: DataFrame, n: Int, key: Column, as: String): DataFrame =
      df.join(cnts(n).select(col("gram").as(s"k_$as"), col("cnt").as(as)),
        key === col(s"k_$as"), "left_outer").drop(s"k_$as")
    val joined = Seq(
      (4, array(col("p1"), col("p2"), col("p3"), col("nxt")), "q4"),
      (3, array(col("p1"), col("p2"), col("p3")), "q3p"),
      (3, array(col("p2"), col("p3"), col("nxt")), "t3"),
      (2, array(col("p2"), col("p3")), "t2p"),
      (2, array(col("p3"), col("nxt")), "b2"),
      (1, array(col("p3")), "b1p"),
      (1, array(col("nxt")), "u1")
    ).foldLeft(pos) { case (df, (n, key, as)) => lj(df, n, key, as) }
    val prob =
      when(col("q3p").isNotNull && col("q4").isNotNull, col("q4") / col("q3p"))
        .when(col("t2p").isNotNull && col("t3").isNotNull, lit(0.4) * col("t3") / col("t2p"))
        .when(col("b1p").isNotNull && col("b2").isNotNull, lit(0.4 * 0.4) * col("b2") / col("b1p"))
        .otherwise(lit(0.4 * 0.4 * 0.4) * coalesce(col("u1"), lit(0L)) / lit(math.max(1L, total)))
    joined
      .select(col("cid"),
        when(prob > 0, log(prob)).otherwise(lit(Double.NegativeInfinity)).as("lp"))
      .groupBy("cid").agg(sum("lp").as("lm_lp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
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
